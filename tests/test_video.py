"""Chunked video runs: checkpoint/resume manifest (SURVEY.md §5.4)."""

import json
import os

import numpy as np
import pytest

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.video import process_video, synthetic_source
from color_modem_tpu.parallel import make_mesh
from color_modem_tpu.utils.manifest import ChunkManifest

L = 32


def test_video_run_and_resume(tmp_path):
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    out = str(tmp_path / "run")
    s1 = process_video(plan, src, 6, out, decoder="notch", chunk=2)
    assert s1["frames_processed_this_run"] == 6
    assert s1["min_psnr_db"] > 35

    # resume: everything already done -> nothing processed
    s2 = process_video(plan, src, 6, out, decoder="notch", chunk=2)
    assert s2["frames_processed_this_run"] == 0

    m = ChunkManifest(out)
    assert m.summary() == {"chunks_done": 3, "frames_done": 6}
    # results JSON written (SURVEY.md §5.5)
    results = os.listdir(os.path.join(out, "results"))
    assert len(results) == 2
    with open(os.path.join(out, "results", results[0])) as f:
        assert json.load(f)["standard"] == "ntsc"


def test_resume_rejects_config_change(tmp_path):
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    out = str(tmp_path / "run")
    process_video(plan, src, 2, out, decoder="notch", chunk=2)
    with pytest.raises(ValueError, match="refusing to resume"):
        process_video(plan, src, 2, out, decoder="comb3", chunk=2)


def test_resume_rejects_old_noise_keying(tmp_path):
    """A noisy-run manifest written before the per-absolute-frame noise
    keying (its config lacks ``noise_keying``) must REFUSE to resume: the
    remaining chunks would be generated under a different channel
    realization, silently mixing two realizations in one directory."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    out = str(tmp_path / "run")
    chan = {"noise_sigma": 0.02}
    process_video(plan, src, 2, out, decoder="notch", chunk=2, channel=chan)
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    assert m["config"]["noise_keying"] == "abs-frame"
    del m["config"]["noise_keying"]  # simulate a pre-change manifest
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="refusing to resume"):
        process_video(plan, src, 2, out, decoder="notch", chunk=2,
                      channel=chan)
    # a clean (noiseless) run stays resumable across the change: the key is
    # sparse, present only when noise is actually applied
    out2 = str(tmp_path / "clean")
    process_video(plan, src, 2, out2, decoder="notch", chunk=2)
    with open(os.path.join(out2, "manifest.json")) as f:
        assert "noise_keying" not in json.load(f)["config"]


def test_video_sharded(tmp_path):
    plan = get_plan("pal")
    src = synthetic_source(L, TEST_SAMPLES)
    mesh = make_mesh(2, 4)
    s = process_video(
        plan, src, 4, str(tmp_path / "sharded"),
        decoder="delayline", chunk=2, mesh=mesh,
    )
    assert s["frames_processed_this_run"] == 4
    assert s["mesh"] == {"frame": 2, "lineblk": 4}
    assert s["min_psnr_db"] > 33


def test_video_interlaced(tmp_path):
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    s = process_video(
        plan, src, 4, str(tmp_path / "int"),
        decoder="comb3", chunk=2, interlaced=True,
    )
    assert s["frames_processed_this_run"] == 4
    assert s["interlaced"] is True
    assert s["min_psnr_db"] > 33
    # interlaced + mesh composes (VERDICT r1 item 5): same frames through
    # the sharded interlaced pipeline match the single-device outputs to
    # the float composition bound (2-frame chunks change fp scheduling, so
    # bit-equality is not expected here; tests/test_sharding.py holds it
    # at the suite geometry)
    process_video(
        plan, src, 4, str(tmp_path / "int_u"),
        decoder="comb3", chunk=2, interlaced=True, save_outputs=True,
    )
    ss = process_video(
        plan, src, 4, str(tmp_path / "int_sh"),
        decoder="comb3", chunk=2, interlaced=True, mesh=make_mesh(2, 4),
        save_outputs=True,
    )
    assert ss["frames_processed_this_run"] == 4
    assert ss["min_psnr_db"] == pytest.approx(s["min_psnr_db"], abs=0.02)
    for f in ("rgb_000000.npy", "rgb_000002.npy"):
        np.testing.assert_allclose(
            np.load(tmp_path / "int_sh" / f), np.load(tmp_path / "int_u" / f),
            atol=1e-6, rtol=0,
        )
    # temporal comb over same-parity fields, incl. chunk overlap plumbing;
    # static source — the default synthetic source decorrelates frames,
    # which is exactly what a temporal comb cannot exploit
    from color_modem_tpu.utils.testimages import smooth_scene

    one = smooth_scene(L, TEST_SAMPLES, seed=0).astype(np.float32)
    static = lambda start, count: np.broadcast_to(  # noqa: E731
        one, (count,) + one.shape
    )
    s3d = process_video(plan, static, 4, str(tmp_path / "int3d"),
                        decoder="comb3d", chunk=2, interlaced=True)
    assert s3d["frames_processed_this_run"] == 4
    assert s3d["min_psnr_db"] > 40


def test_video_ghost_equalize(tmp_path):
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    ghost = {"ghost_delay_us": 1.2, "ghost_gain": 0.3}
    bad = process_video(plan, src, 2, str(tmp_path / "g"),
                        decoder="comb3", chunk=2, channel=dict(ghost))
    good = process_video(plan, src, 2, str(tmp_path / "ge"),
                         decoder="comb3", chunk=2,
                         channel={**ghost, "equalize": True})
    assert good["min_psnr_db"] - bad["min_psnr_db"] > 3.0, (bad, good)


def test_video_nr(tmp_path):
    """Noisy static video through --nr gains several dB per chunk."""
    from color_modem_tpu.utils.testimages import smooth_scene

    plan = get_plan("ntsc")
    one = smooth_scene(L, TEST_SAMPLES, seed=3).astype(np.float32)
    static = lambda start, count: np.broadcast_to(  # noqa: E731
        one, (count,) + one.shape
    )
    noise = {"noise_sigma": 0.02}
    raw = process_video(plan, static, 4, str(tmp_path / "raw"),
                        decoder="comb3", chunk=4, channel=dict(noise))
    den = process_video(plan, static, 4, str(tmp_path / "den"),
                        decoder="comb3", chunk=4, channel=dict(noise),
                        nr=True)
    assert den["min_psnr_db"] - raw["min_psnr_db"] > 2.5, (raw, den)
    # a one-frame tail chunk must pad, not crash the 3-frame stencil
    s = process_video(plan, static, 5, str(tmp_path / "tail"),
                      decoder="comb3", chunk=4, channel=dict(noise),
                      nr=True)
    assert s["frames_processed_this_run"] == 5


def test_video_nr_chunk_independent(tmp_path):
    """NR at chunk boundaries must see TRUE neighbor frames (overlap
    fetch), so the denoised output cannot depend on the chunk size."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)  # distinct frame per index
    outs = {}
    for chunk in (2, 6):
        d = str(tmp_path / f"c{chunk}")
        process_video(plan, src, 6, d, decoder="comb3", chunk=chunk,
                      nr=True, nr_sigma=0.5, save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(f"{d}/rgb_{s:06d}.npy") for s in range(0, 6, chunk)
        ])
    np.testing.assert_allclose(outs[2], outs[6], atol=1e-6)


def test_video_noise_chunk_independent(tmp_path):
    """Channel noise is keyed per ABSOLUTE frame index (ADVICE r1): a
    frame fetched as chunk overlap must see the identical realization it
    gets as a chunk interior, so noisy comb3d/NR output cannot depend on
    the chunk size."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    noise = {"noise_sigma": 0.02}
    outs = {}
    for chunk in (2, 6):
        d = str(tmp_path / f"n{chunk}")
        process_video(plan, src, 6, d, decoder="comb3", chunk=chunk,
                      channel=dict(noise), nr=True, save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(f"{d}/rgb_{s:06d}.npy") for s in range(0, 6, chunk)
        ])
    np.testing.assert_allclose(outs[2], outs[6], atol=1e-6)


def test_video_noise_chunk_independent_interlaced(tmp_path):
    """Interlaced encode puts FIELDS (2/frame) on the leading axis, so the
    absolute noise key must scale frame0 by the fields-per-frame factor —
    keying fields off frame0 + i directly tied the realization to the
    chunk start (review finding r2: max |diff| 0.15 between chunk sizes)."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    outs = {}
    for chunk in (2, 4):
        d = str(tmp_path / f"i{chunk}")
        process_video(plan, src, 4, d, decoder="comb3", chunk=chunk,
                      interlaced=True, channel={"noise_sigma": 0.02},
                      save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(f"{d}/rgb_{s:06d}.npy") for s in range(0, 4, chunk)
        ])
    np.testing.assert_allclose(outs[2], outs[4], atol=1e-6)


def test_video_noise_chunk_independent_equalize(tmp_path):
    """The GCR equalizer's noisy reference record uses a FIXED key (its own
    base, no frame0), so designed taps — and decoded frames — match across
    chunk layouts too (review finding r2: a frame0-derived key made
    equalize+noise output chunk-size dependent)."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    chan = {"noise_sigma": 0.02, "equalize": True,
            "ghost_delay_us": 0.5, "ghost_gain": 0.2}
    outs = {}
    for chunk in (2, 4):
        d = str(tmp_path / f"e{chunk}")
        process_video(plan, src, 4, d, decoder="comb3", chunk=chunk,
                      channel=dict(chan), save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(f"{d}/rgb_{s:06d}.npy") for s in range(0, 4, chunk)
        ])
    np.testing.assert_allclose(outs[2], outs[4], atol=1e-6)


def test_video_rf_hop_and_chunk_independence(tmp_path):
    """The RF/VSB hop inside the chunk step: near-lossless, and the output
    is chunk-size independent because the carrier row law keys on the
    ABSOLUTE leading-axis index (an odd chunk start would otherwise flip
    the (-1)^row parity)."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    clean = process_video(plan, src, 4, str(tmp_path / "clean"),
                          decoder="notch", chunk=4)
    outs = {}
    for chunk in (2, 3):  # chunk=3 puts a chunk start at an ODD frame
        d = str(tmp_path / f"rf{chunk}")
        s = process_video(plan, src, 4, d, decoder="notch", chunk=chunk,
                          rf=True, save_outputs=True)
        # at this tiny 32-line height the RF filters' frame-edge transients
        # weigh ~0.8 dB of whole-frame PSNR (tests/test_rf.py crops 2 lines
        # and measures < 0.1 dB); full-height frames amortize the edges
        assert s["min_psnr_db"] >= clean["min_psnr_db"] - 1.0, (
            f"RF hop cost too much: {s['min_psnr_db']} vs {clean['min_psnr_db']}"
        )
        outs[chunk] = np.concatenate([
            np.load(os.path.join(d, f))
            for f in sorted(os.listdir(d)) if f.endswith(".npy")
        ])
    # different chunk sizes change batch shapes -> XLA fp scheduling moves
    # by ~3e-6; a carrier-parity bug would be dB-level garbage, which the
    # tight bound still catches
    np.testing.assert_allclose(outs[2], outs[3], atol=1e-5, rtol=0)
    # manifest refuses to resume an rf run without rf
    with pytest.raises(ValueError, match="refusing to resume"):
        process_video(plan, src, 4, str(tmp_path / "rf2"), decoder="notch",
                      chunk=2)


def test_video_rf_interlaced_chunk_independent(tmp_path):
    """Interlaced + RF: the hop keys the carrier on absolute FIELD index
    (frame0 * 2), so chunkings with odd frame starts still agree."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    outs = {}
    for chunk in (2, 3):
        d = str(tmp_path / f"i{chunk}")
        process_video(plan, src, 4, d, decoder="notch", chunk=chunk,
                      interlaced=True, rf=True, save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(os.path.join(d, f))
            for f in sorted(os.listdir(d)) if f.endswith(".npy")
        ])
    # ~3e-6 fp-scheduling tolerance (see the progressive RF test)
    np.testing.assert_allclose(outs[2], outs[3], atol=1e-5, rtol=0)


def test_video_rf_audio_phase_continuous(tmp_path):
    """Soundtrack through the chunked runner: the FM sound carrier's
    deviation phase continues across frames (joined-stream integration)
    AND chunks (host-f64 prefix phi0), so audio quality matches the
    single-shot chain and the output is chunk-size independent.
    Measured 2026-08-18: 61.9 dB at both chunkings, max diff 1e-6."""
    import glob

    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    n = 5
    t = np.arange(n * L * TEST_SAMPLES) / plan.fs
    aud = (0.5 * np.sin(2 * np.pi * 700 * t)
           + 0.3 * np.sin(2 * np.pi * 4000 * t)).astype(np.float32)
    outs = {}
    for chunk in (2, 3):
        d = str(tmp_path / f"s{chunk}")
        s = process_video(plan, src, n, d, decoder="notch", chunk=chunk,
                          rf=True, rf_audio=aud)
        assert s["frames_processed_this_run"] == n
        got = np.concatenate([
            np.load(p) for p in sorted(glob.glob(d + "/aud_*.npy"))
        ])
        assert got.shape == aud.shape
        crop = 8192
        e = got[crop:-crop] - aud[crop:-crop]
        snr = 10 * np.log10(np.mean(aud[crop:-crop] ** 2) / np.mean(e ** 2))
        assert snr >= 55.0, snr
        outs[chunk] = got
    np.testing.assert_allclose(outs[2], outs[3], atol=1e-4, rtol=0)
    # a non-audio resume of an audio run must refuse
    with pytest.raises(ValueError, match="refusing to resume"):
        process_video(plan, src, n, str(tmp_path / "s2"), decoder="notch",
                      chunk=2, rf=True)
    # guard: audio needs the RF layer
    with pytest.raises(ValueError, match="rf=True"):
        process_video(plan, src, 2, str(tmp_path / "x"), chunk=2,
                      rf_audio=aud)


def test_video_rf_audio_interlaced(tmp_path):
    """rf_audio composes with interlaced fields (VERDICT r2 item 4): the
    audio stream slices per FIELD (field-sequential order IS transmission
    order, so each frame's block splits into consecutive halves), rides
    the joined-stream FM carrier with the host-f64 prefix phase, and the
    recovered audio is chunk-size independent at the same quality as the
    progressive run."""
    import glob

    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    n = 4
    t = np.arange(n * L * TEST_SAMPLES) / plan.fs
    aud = (0.5 * np.sin(2 * np.pi * 700 * t)
           + 0.3 * np.sin(2 * np.pi * 4000 * t)).astype(np.float32)
    outs = {}
    for chunk in (2, 4):
        d = str(tmp_path / f"i{chunk}")
        s = process_video(plan, src, n, d, decoder="notch", chunk=chunk,
                          rf=True, interlaced=True, rf_audio=aud)
        assert s["frames_processed_this_run"] == n
        got = np.concatenate([
            np.load(p) for p in sorted(glob.glob(d + "/aud_*.npy"))
        ])
        assert got.shape == aud.shape
        crop = 8192
        e = got[crop:-crop] - aud[crop:-crop]
        snr = 10 * np.log10(np.mean(aud[crop:-crop] ** 2) / np.mean(e ** 2))
        assert snr >= 55.0, snr
        outs[chunk] = got
    np.testing.assert_allclose(outs[2], outs[4], atol=1e-4, rtol=0)


def test_video_scramble_interlaced_chunk_independent(tmp_path):
    """Scramble composes with interlaced fields (VERDICT r2 item 4): the
    key schedule hashes the FIELD-SEQUENTIAL absolute line numbering
    (frame/interlace.py), so chunking cannot move it — and on a clean
    channel the scrambled-then-descrambled interlaced output is
    BIT-identical to the plain interlaced run (index ops never touch
    sample values)."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    outs = {}
    for chunk in (2, 6):
        d = str(tmp_path / f"si{chunk}")
        process_video(plan, src, 6, d, decoder="comb2", chunk=chunk,
                      interlaced=True, channel={"noise_sigma": 0.02},
                      scramble=("cutrotate", 0xC0FFEE), save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(f"{d}/rgb_{s:06d}.npy") for s in range(0, 6, chunk)
        ])
    np.testing.assert_allclose(outs[2], outs[6], atol=1e-6)
    d1 = str(tmp_path / "clear")
    d2 = str(tmp_path / "scr")
    process_video(plan, src, 4, d1, decoder="comb2", chunk=4,
                  interlaced=True, save_outputs=True)
    process_video(plan, src, 4, d2, decoder="comb2", chunk=4,
                  interlaced=True, scramble=("linedelay", 7),
                  save_outputs=True)
    a = np.load(f"{d1}/rgb_000000.npy")
    b = np.load(f"{d2}/rgb_000000.npy")
    assert np.array_equal(a, b)


def test_video_satellite_hop_chunk_independent(tmp_path):
    """The satellite FM hop inside the chunk step: near-lossless when
    clean, and with channel noise the realization keys on the ABSOLUTE
    leading-axis index, so output cannot depend on the chunk layout."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    clean = process_video(plan, src, 4, str(tmp_path / "clean"),
                          decoder="notch", chunk=4)
    s = process_video(plan, src, 4, str(tmp_path / "sat"),
                      decoder="notch", chunk=4, satellite=True)
    # frame-local circular FM: the hop costs well under a dB
    assert s["min_psnr_db"] >= clean["min_psnr_db"] - 1.0, (s, clean)
    outs = {}
    for chunk in (2, 3):  # chunk=3 puts a chunk start at an ODD frame
        d = str(tmp_path / f"sn{chunk}")
        sn = process_video(plan, src, 4, d, decoder="notch", chunk=chunk,
                           satellite=True, sat_cnr=14.0, save_outputs=True)
        assert sn["min_psnr_db"] > 25.0, sn  # FM advantage holds it up
        outs[chunk] = np.concatenate([
            np.load(os.path.join(d, f))
            for f in sorted(os.listdir(d)) if f.endswith(".npy")
        ])
    # chunk size changes batch shapes -> fp scheduling moves; unlike the
    # linear VSB path (~3e-6) the FM discriminator's atan2/derivative
    # amplifies that to ~2e-4 here. A keying bug would be a DIFFERENT
    # noise realization entirely (measured ~0.15 max diff in the r2
    # interlaced review finding), so 1e-3 still catches it with margin.
    np.testing.assert_allclose(outs[2], outs[3], atol=1e-3, rtol=0)
    # manifest records the hop: a non-satellite resume must refuse
    with pytest.raises(ValueError, match="refusing to resume"):
        process_video(plan, src, 4, str(tmp_path / "sn2"), decoder="notch",
                      chunk=2)


def test_video_scramble_satellite_chunk_independent(tmp_path):
    """Scramble composes with the satellite FM hop in the chunked runner
    (VERDICT r3 item 2 — the authentic Videocrypt-on-Astra chain on real
    video workloads, previously a ValueError): the scrambled composite
    rides the hop, the keyed receiver descrambles before decode, and both
    the key schedule (absolute-line hash) and the hop (frame-local FM)
    are chunk-exact, so output cannot depend on the chunk layout.  Also
    asserts what conditional access sells: a pirate decoding the hopped
    signal WITHOUT the key stays far below the subscriber."""
    import jax.numpy as jnp

    from color_modem_tpu.frame import satellite as sat
    from color_modem_tpu.frame.pipeline import frame_line_index, make_pipeline
    from color_modem_tpu.frame.scramble import scramble as _scr
    from color_modem_tpu.utils.metrics import psnr

    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    key = 0xC0FFEE
    outs, summ = {}, {}
    for chunk in (2, 3):  # chunk=3 puts a chunk start at an ODD frame
        d = str(tmp_path / f"ss{chunk}")
        s = process_video(plan, src, 4, d, decoder="notch", chunk=chunk,
                          satellite=True, scramble=("cutrotate", key),
                          save_outputs=True)
        summ[chunk] = s
        outs[chunk] = np.concatenate([
            np.load(os.path.join(d, f))
            for f in sorted(os.listdir(d)) if f.endswith(".npy")
        ])
    # same tolerance story as the plain satellite chunk test: the FM
    # discriminator amplifies chunk-shape fp scheduling to ~2e-4
    np.testing.assert_allclose(outs[2], outs[3], atol=1e-3, rtol=0)
    # the subscriber pays nothing for the scrambling itself (descramble
    # is bit-exact): within a dB of the unscrambled satellite run
    clean = process_video(plan, src, 4, str(tmp_path / "clean"),
                          decoder="notch", chunk=4, satellite=True)
    assert summ[2]["min_psnr_db"] >= clean["min_psnr_db"] - 1.0, (
        summ[2], clean)
    # pirate: the same scrambled signal over the same hop, decoded
    # without the key (mirrors test_scramble.py's roundtrip gap cases)
    rgb = np.asarray(src(0, 2))
    enc, dec, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(rgb), 0)
    g = frame_line_index(plan, 0, 2, L)
    sp = sat.make_sat_plan(plan.fs, TEST_SAMPLES)
    hopped = sat.fm_demodulate(
        sp, sat.fm_modulate(sp, _scr(plan, comp, g, "cutrotate", key))
    )
    pirate = psnr(np.asarray(dec(hopped, 0)), rgb)
    assert summ[2]["min_psnr_db"] - pirate > 8.0, (summ[2], pirate)


def test_video_scramble_rf_chunk_independent(tmp_path):
    """Same composition over the terrestrial RF/VSB hop: scrambled
    composite through sync detection, descrambled at the receiver —
    chunk-independent to the linear chain's usual fp-scheduling floor
    and within a dB of the plain RF run."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    clean = process_video(plan, src, 4, str(tmp_path / "clean"),
                          decoder="notch", chunk=4, rf=True)
    outs = {}
    for chunk in (2, 3):
        d = str(tmp_path / f"sr{chunk}")
        s = process_video(plan, src, 4, d, decoder="notch", chunk=chunk,
                          rf=True, scramble=("linedelay", 7),
                          save_outputs=True)
        assert s["min_psnr_db"] >= clean["min_psnr_db"] - 1.0, (s, clean)
        outs[chunk] = np.concatenate([
            np.load(os.path.join(d, f))
            for f in sorted(os.listdir(d)) if f.endswith(".npy")
        ])
    np.testing.assert_allclose(outs[2], outs[3], atol=1e-4, rtol=0)
    # rf and satellite are mutually exclusive layers
    with pytest.raises(ValueError, match="pick one"):
        process_video(plan, src, 2, str(tmp_path / "x"), chunk=2,
                      rf=True, satellite=True)


def test_chunk_fingerprints_are_deterministic(tmp_path):
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    process_video(plan, src, 2, str(tmp_path / "a"), chunk=2)
    process_video(plan, src, 2, str(tmp_path / "b"), chunk=2)
    ha = ChunkManifest(str(tmp_path / "a")).data["chunks"]["0-2"]["fp"]
    hb = ChunkManifest(str(tmp_path / "b")).data["chunks"]["0-2"]["fp"]
    assert ha == hb


def test_y4m_write_read_roundtrip(tmp_path):
    """C444 write -> read costs only the 8-bit quantization (~45 dB)."""
    from color_modem_tpu.frame.y4m import write_y4m, y4m_info, y4m_source
    from color_modem_tpu.utils.metrics import psnr

    rng = np.random.default_rng(3)
    frames = rng.uniform(0.0, 1.0, (5, 3, 32, 128)).astype(np.float32)
    path = str(tmp_path / "clip.y4m")
    assert write_y4m(path, [frames[:2], frames[2:]], fps=(25, 1)) == 5
    w, h, fps, cs, n = y4m_info(path)
    assert (w, h, fps, cs, n) == (128, 32, (25, 1), "444", 5)
    src, n2, h2, w2 = y4m_source(path)
    assert (n2, h2, w2) == (5, 32, 128)
    back = src(0, 5)
    assert psnr(back, frames) > 40.0
    # random access: a middle read equals the matching slice of the full
    np.testing.assert_array_equal(src(2, 2), back[2:4])


def test_cli_video_y4m_in_out(tmp_path, capsys):
    """Real-clip path end to end: write a y4m, run the video verb on it,
    read the decoded clip back and check quality against the source."""
    from color_modem_tpu.cli import main
    from color_modem_tpu.frame.y4m import write_y4m, y4m_source
    from color_modem_tpu.utils.metrics import psnr
    from color_modem_tpu.utils.testimages import smooth_scene

    clip = str(tmp_path / "in.y4m")
    frames = np.stack(
        [smooth_scene(L, TEST_SAMPLES, seed=s) for s in range(5)]
    ).astype(np.float32)
    write_y4m(clip, [frames])
    out_clip = str(tmp_path / "out.y4m")
    rc = main(["video", "--standard", "ntsc", "--decoder", "comb3",
               "--input", clip, "--output", out_clip,
               "--out", str(tmp_path / "run"), "--chunk", "3"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_frames"] == 5 and rep["output_frames"] == 5
    assert "output_incomplete" not in rep
    src, n, h, w = y4m_source(out_clip)
    assert (n, h, w) == (5, L, TEST_SAMPLES)
    p = psnr(src(0, 5), frames)
    # comb3 roundtrip on this fixture is ~40+ dB; 8-bit I/O caps it near
    # the container's own quantization floor
    assert p > 33.0, p
    assert rep["min_psnr_db"] > 33.0


def test_video_caption_stream(tmp_path):
    """Line-21 streaming: one caption cell per frame, keyed by absolute
    frame index — the decoded text is exact and chunk-size independent."""
    from color_modem_tpu.frame.vbi import cc_pack, cc_unpack

    plan = get_plan("ntsc")
    text = "STREAMING CAPS OK"  # 17 chars -> 9 cells, pad to 10 frames
    n = 10
    padded = text.ljust(2 * n)
    bits = np.stack(
        [np.asarray(cc_pack(padded[2 * i : 2 * i + 2])) for i in range(n)]
    )

    def run(out, chunk):
        process_video(
            plan, synthetic_source(L, TEST_SAMPLES), n, out,
            decoder="comb3", chunk=chunk, caption_bits=bits,
            channel={"noise_sigma": 0.01},
        )
        got, ok = [], True
        import glob

        for p in sorted(glob.glob(os.path.join(out, "cc_*.npy"))):
            for row in np.load(p):
                s, good = cc_unpack(row)
                got.append(s)
                ok = ok and good
        return "".join(got), ok

    r1, ok1 = run(str(tmp_path / "a"), 4)
    assert ok1 and r1 == padded, r1
    r2, ok2 = run(str(tmp_path / "b"), 7)
    assert (r2, ok2) == (r1, ok1)


def test_video_scramble_caption(tmp_path):
    """Captions through a scrambled run (a round-3 refusal, now wired —
    VERDICT r3 item 2): the caption row scrambles with the picture, and
    the receiver's data slicer reads the DESCRAMBLED composite (cli.py's
    'data services descramble bit-exactly like the picture' order), so
    the streamed text is exact and chunk-independent."""
    from color_modem_tpu.frame.vbi import cc_pack, cc_unpack

    plan = get_plan("ntsc")
    text = "PAY TV CAPS"  # 11 chars -> 6 cells = 6 frames
    n = 6
    padded = text.ljust(2 * n)
    bits = np.stack(
        [np.asarray(cc_pack(padded[2 * i : 2 * i + 2])) for i in range(n)]
    )

    def run(out, chunk):
        process_video(
            plan, synthetic_source(L, TEST_SAMPLES), n, out,
            decoder="comb3", chunk=chunk, caption_bits=bits,
            channel={"noise_sigma": 0.01},
            scramble=("cutrotate", 0xC0FFEE),
        )
        import glob

        got, ok = [], True
        for p in sorted(glob.glob(os.path.join(out, "cc_*.npy"))):
            for row in np.load(p):
                s, good = cc_unpack(row)
                got.append(s)
                ok = ok and good
        return "".join(got), ok

    r1, ok1 = run(str(tmp_path / "a"), 4)
    assert ok1 and r1 == padded, r1
    r2, ok2 = run(str(tmp_path / "b"), 5)
    assert (r2, ok2) == (r1, ok1)


def test_video_caption_interlaced_chunk_independent(tmp_path):
    """Field-cadenced line 21 in the chunked runner (a round-4 refusal,
    now wired — VERDICT r4 item 3): frame i's caption cell rides row 0
    of its FIRST field, keyed by the absolute frame index, exactly as
    the one-shot full-stack CLI already decodes it — so an interlaced
    run streams the same exact text at any chunk size."""
    from color_modem_tpu.frame.vbi import cc_pack, cc_unpack

    plan = get_plan("ntsc")
    text = "FIELD CADENCE"  # 13 chars -> 7 cells = 7 frames
    n = 7
    padded = text.ljust(2 * n)
    bits = np.stack(
        [np.asarray(cc_pack(padded[2 * i : 2 * i + 2])) for i in range(n)]
    )

    def run(out, chunk):
        summary = process_video(
            plan, synthetic_source(L, TEST_SAMPLES), n, out,
            decoder="comb3", chunk=chunk, interlaced=True,
            caption_bits=bits, channel={"noise_sigma": 0.01},
        )
        import glob

        got, ok = [], True
        for p in sorted(glob.glob(os.path.join(out, "cc_*.npy"))):
            for row in np.load(p):
                s, good = cc_unpack(row)
                got.append(s)
                ok = ok and good
        return "".join(got), ok, summary["min_psnr_db"]

    r1, ok1, q1 = run(str(tmp_path / "a"), 4)
    assert ok1 and r1 == padded, r1
    assert q1 > 25.0, q1  # the data row is excluded from picture PSNR
    r2, ok2, _ = run(str(tmp_path / "b"), 5)
    assert (r2, ok2) == (r1, ok1)


def test_cli_video_rf_stereo(tmp_path, capsys):
    """Stereo television: the MTS multiplex rides the chunked runner's
    sound carrier as an opaque composite-rate stream; the CLI decodes
    L/R at the end (measured: L 68 / R 60 dB, pilot at its 0.1 level)."""
    from color_modem_tpu.cli import main

    rc = main(["video", "--standard", "ntsc", "--decoder", "comb3",
               "--frames", "6", "--lines", str(L), "--chunk", "3",
               "--out", str(tmp_path / "run"), "--rf", "--rf-stereo",
               "--audio-out", str(tmp_path / "st.wav")])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    st = rep["stereo"]
    assert st["left_snr_db"] > 45.0 and st["right_snr_db"] > 45.0, st
    assert st["pilot"] == pytest.approx(0.1, rel=0.2)
    from color_modem_tpu.utils.wav import read_wav

    y, rate = read_wav(str(tmp_path / "st.wav"))
    assert rate == 48000 and y.shape[0] == 2


def test_video_scramble_chunk_independent(tmp_path):
    """Pay-TV scrambling through the chunked runner: the keyed schedule
    hashes the ABSOLUTE line index (frame/scramble.py), so chunk size
    cannot change anything — and with noise BETWEEN scramble and
    descramble the output still matches the unscrambled noisy run's
    realization per frame (descrambling permutes the composite before
    the noise is added... no: noise lands on the scrambled geometry, so
    only the scrambled run's own chunk-independence is asserted)."""
    plan = get_plan("ntsc")
    src = synthetic_source(L, TEST_SAMPLES)
    outs = {}
    for chunk in (2, 6):
        d = str(tmp_path / f"s{chunk}")
        process_video(plan, src, 6, d, decoder="comb3", chunk=chunk,
                      channel={"noise_sigma": 0.02},
                      scramble=("cutrotate", 0xC0FFEE), save_outputs=True)
        outs[chunk] = np.concatenate([
            np.load(f"{d}/rgb_{s:06d}.npy") for s in range(0, 6, chunk)
        ])
    np.testing.assert_allclose(outs[2], outs[6], atol=1e-6)
    # and on a clean channel, scrambled-and-descrambled output is BIT-
    # identical to the plain pipeline's
    d1 = str(tmp_path / "clear")
    d2 = str(tmp_path / "scr")
    process_video(plan, src, 4, d1, decoder="comb3", chunk=4,
                  save_outputs=True)
    process_video(plan, src, 4, d2, decoder="comb3", chunk=4,
                  scramble=("shuffle", 7), save_outputs=True)
    a = np.load(f"{d1}/rgb_000000.npy")
    b = np.load(f"{d2}/rgb_000000.npy")
    assert np.array_equal(a, b)
