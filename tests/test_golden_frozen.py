"""The golden oracle is FROZEN (SURVEY.md §4.2).

The oracle plays the role of the (unavailable) reference implementation: all
JAX/Pallas paths are judged against it, so silently "fixing" golden to match
a buggy pipeline would destroy the whole accuracy argument.  Any edit to
``color_modem_tpu/golden/`` must be deliberate: re-derive the change from the
SURVEY.md Appendix A spec, then update the recorded hashes here IN THE SAME
COMMIT with a justification in the commit message.
"""

import hashlib
import pathlib

import color_modem_tpu.golden as golden

FROZEN = {
    # __init__.py updated 2026-08-17 (round 2): re-export decode_sequence.
    "__init__.py": "9d669d5672a2bddb",
    # frame.py updated 2026-08-16: guard-only change — decode_frame now
    # REFUSES decoder='comb3d' (it used to fall through to notch silently;
    # the per-frame oracle cannot represent a cross-frame decoder).  No
    # numerical path changed.
    # frame.py updated 2026-08-17: ADDITIVE change — a 'combA' branch
    # (adaptive soft-switching comb, a new decoder with no reference
    # counterpart) was added to _decode_qam.  Every pre-existing decoder's
    # numerical path is untouched; the new branch was written first here,
    # per-scanline NumPy, then mirrored in separate/comb.py.
    # frame.py updated again 2026-08-17 (guard-only): the temporal-decoder
    # refusal now also names comb3dA.
    # frame.py updated 2026-08-17 (round 2): ADDITIVE change per VERDICT.md
    # item 7 — the chroma-averaging wrapper ('avg') now also applies to
    # SECAM (post-assembly Dr/Db averaging) and NIIR (post-normalization),
    # re-derived from SURVEY.md C6 [MEM-M] "wrapping any base modem" + A.4/
    # A.5.  The shared `_average_neighbor` helper replaces the inline QAM
    # averaging loop with identical arithmetic; every pre-existing
    # (standard, decoder) numerical path is unchanged (enforced by the
    # parity tests, which passed unmodified across this edit).
    # frame.py updated 2026-08-17 (round 2, VERDICT item 6): ADDITIVE
    # multi-frame oracle `decode_sequence` for the temporal combs (per-line
    # NumPy loops over a frame stack; frame neighbors follow the phase-safe
    # odd-multiple edge rule re-derived from the phase law, line neighbors
    # the existing _reflect).  decode_frame's temporal refusal message now
    # points to it.  No pre-existing numerical path changed.
    # frame.py + modems.py updated 2026-08-17 (round 2, VERDICT "what's
    # weak" item 1 — SECAM floor): three SPEC-derived physics corrections,
    # each re-derived from A.4 and mirrored golden-first:
    #  1. held-edge baseband convolution (conv_same_held) for the component
    #     LPF + pre-emphasis: the analog line continues through blanking, so
    #     a baseband filter's neighborhood is ~the edge value, not zero
    #     (zero edges put a full-scale step through the 1.9 us de-emphasis
    #     tail).  Carrier-band filters keep zero edges.
    #  2. midpoint-rule FM phase integral (cumsum - f/2): the decoder's
    #     symmetric-derivative discriminator then reads f_inst at exactly
    #     sample n (the rectangle rule advanced it a half-sample: measured
    #     +13.3 deg/MHz component phase error).
    #  3. decode-side blanking reconstruction (_extend_blanking): the real
    #     signal carries black + the undeviated rest carrier through
    #     blanking; the oracle rebuilds M=48 samples per side (pedestal
    #     from the K=27-sample edge mean; left margin adds the rest carrier
    #     at its convention phase) before the long decode filters.
    # Plus an ADDITIVE 'interp' pairing branch in _decode_secam (average of
    # both adjacent carrier lines — beyond-reference, mirrored from
    # modem/secam.pair_components_interp which was written golden-first).
    # Net: SECAM round-trip 32.8 -> 35.1 dB (notch) / 38.5 dB (interp) on
    # the 64x720 smooth fixture; thresholds raised in test_roundtrip.py in
    # this same commit.
    # modems.py touched once more in the same commit: the blanking
    # pedestal-estimate length K now reads plan.fm_luma_est (fs-scaled,
    # = the old SECAM_LUMA_EST constant at 720-sample lines) so the oracle
    # follows the pipeline's tap/margin scaling at wider lines.
    # modems.py updated 2026-08-17 (round 2, review finding): removed the
    # DEAD ``self.mix_ramp`` copy in GoldenSecamModem.__init__ — every
    # consumer (golden demodulate included) moved to plan.mix_ramp_ext in
    # the blanking-reconstruction commit, and ModemPlan.mix_ramp itself is
    # deleted in this same commit.  No numerical path touched (attribute
    # was never read).
    "frame.py": "2157eb6003944eb2",
    "modems.py": "4c4b4578a727cf70",
    # mac.py ADDED 2026-08-18 (round 2): NEW-FILE oracle for the
    # beyond-reference D2-MAC family (modem/mac.py) — sequential per-line
    # NumPy with a stateful bit-by-bit duobinary precoder and an explicit
    # chroma line store, written oracle-first.  No pre-existing golden
    # file touched.
    # mac.py updated 2026-08-18 (round 2): ADDITIVE change — the burst
    # writer/reader honor cfg.samples_per_symbol for the full-rate D-MAC
    # variant (spb=1: one duobinary level per grid sample, no half-band
    # interpolation — the (1+D)/2 correlation is the spectrum shaping,
    # BO.650's satellite member at 20.25 Mbaud).  The D2 path (spb=2) is
    # numerically IDENTICAL to before: same zero-stuff + convolve, the
    # factor 2 merely became cfg.samples_per_symbol (enforced by the
    # unmodified D2 parity tests passing across this edit).
    "mac.py": "f6c08015baa67284",
    # transmission.py ADDED 2026-08-19 (round 3, VERDICT r2 item 7):
    # NEW-FILE oracle for the beyond-reference transmission layers —
    # naive per-sample NumPy f64 VSB picture chain (explicit zero-stuff,
    # uncomposed filter-mix-filter cascade, absolute-sample carrier
    # phase) and satellite FM video chain (explicit fs/4 mixers, separate
    # I/Q low-passes, f64 midpoint FM integral), written against the
    # module docstrings' signal math, NOT the dsp/stream.py machinery it
    # certifies.  No pre-existing golden file touched.
    # transmission.py updated 2026-08-20 (round 4, DOC-ONLY): the module
    # docstring's parity-certifier pointer read tests/test_golden_properties
    # .py but the transmission parity tests live in tests/
    # test_golden_transmission.py (round-3 advisor finding).  No code line
    # changed (verified: diff touches one docstring word).
    "transmission.py": "a3bf79c7ef609db3",
    # sound.py ADDED 2026-08-20 (round 4, VERDICT r3 item 4): NEW-FILE
    # oracle for the analog SOUND cores — naive per-sample NumPy f64
    # intercarrier FM sound on/off the RF stream (rectangle-rule cumsum,
    # absolute-sample carrier phase), the MTS pilot + DSB-SC multiplex,
    # satellite audio subcarriers (midpoint circular FM on integer-
    # cycles-per-frame carriers, full naive hop chain with the sound
    # multiplex), and A2's second carrier with its AM-ident pilot —
    # written against the module docstrings' signal math, NOT the
    # composed stream-engine machinery it certifies
    # (tests/test_golden_sound.py).  No pre-existing golden file touched.
    "sound.py": "68c68b948be78fa1",
    # palplus.py ADDED 2026-08-20 (round 5, VERDICT r4 item 7): NEW-FILE
    # oracle for the PALplus letterbox + vertical-helper pair
    # (frame/palplus.py) — per-scanline NumPy f64 with explicit per-line
    # QAM modulation/product detection at the letterbox's in-frame line
    # numbers, the vertical filter bank evaluated column-by-column in f64
    # via the shared dsp.design.resample_matrix (the golden/mac.py
    # sharing precedent), helper transport taps from the caller (the
    # golden/sound.py shared-taps rule).  No pre-existing golden file
    # touched.
    # palplus.py updated 2026-08-20 (round 5, same round as its creation):
    # ADDITIVE change — encode_palplus_fields, the naive per-line mirror
    # of the 625i field-sequential transmission format (frame row j on
    # field j%2, helper lines split alternately across the field pair,
    # field-line-number keying), pinning the interlaced FORMAT a
    # consistent encoder+decoder shift would otherwise hide.  No
    # pre-existing function in the file changed (progressive parity
    # tests passed unmodified across this edit).
    "palplus.py": "68768d308eb6962f",
}


def test_golden_sources_unchanged():
    gdir = pathlib.Path(golden.__file__).parent
    actual = {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()[:16]
        for p in sorted(gdir.glob("*.py"))
    }
    assert actual == FROZEN, (
        "golden/ changed — it is the FROZEN accuracy oracle (SURVEY.md "
        "§4.2). If the change re-derives from the Appendix A spec, update "
        "FROZEN here in the same commit and say why in the commit message."
    )
