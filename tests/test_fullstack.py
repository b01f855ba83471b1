"""The full-stack "authentic broadcast" composition (VERDICT r3 item 7).

Every layer the framework has, stacked the way a real 625-line broadcast
stacked them: interlaced, rastered PAL at the 1440/27 MHz grid with
teletext + WSS + VITC + captions on their VBI lines, Videocrypt-style
scrambling of the active picture (sync/burst in the clear), over the
RF/VSB hop with intercarrier FM mono sound plus EITHER NICAM-728 digital
stereo or A2/Zweikanalton two-carrier stereo.  One CLI invocation per
sound variant; every service must decode concurrently — bits exact,
picture within threshold, subscriber far above the pirate.

This composition smoked out three round-4 defects when first assembled
(all fixed in the same change series): the interlaced picture-PSNR
accounting counted field-0 data lines as picture, the A2 ident detection
used a phase-biased sub-cycle projection, and the NICAM burst's
reference symbol sat at the stream edge where the matched filter loses
its FM-carrier rejection.  A2 + NICAM together is REFUSED (their bands
genuinely overlap — no real channel plan carried both).
"""

import json

import pytest

FULL_FLAGS = [
    "roundtrip", "--standard", "pal", "--decoder", "comb3", "--demo",
    "--pattern", "scene", "--lines", "64", "--width", "1440",
    "--raster", "--interlaced",
    "--teletext", "HELLO WORLD|ROW TWO",
    "--wss", "16:9 full (anamorphic)",
    "--vitc", "01:02:03:04",
    "--caption", "FULL STACK",
    "--scramble", "cutrotate",
    "--rf", "--rf-audio",
]


def _run(capsys, extra, flags=None):
    from color_modem_tpu.cli import main

    assert main((flags or FULL_FLAGS) + extra) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _assert_common(rep):
    # every data service decodes concurrently, bits exact
    assert rep["caption"]["exact"] and rep["caption"]["parity_ok"], rep
    assert rep["teletext"]["exact"] and rep["teletext"]["parity_ok"], rep
    assert rep["wss"]["exact"], rep
    assert rep["vitc"]["exact"] and rep["vitc"]["crc_ok"], rep
    # picture: interlaced comb3 on the 64-line scene reads ~30 dB clean;
    # the whole stack must stay within ~2 dB of that
    assert rep["psnr_db"] > 28.0, rep
    # conditional access: the keyed subscriber far above the pirate
    assert rep["psnr_db"] - rep["scramble"]["pirate_psnr_db"] > 10.0, rep


def test_full_broadcast_stack_nicam(capsys):
    """Raster + interlace + 4 data services + scramble + RF hop with FM
    mono sound AND NICAM digital stereo — the Scandinavian-style plan."""
    rep = _run(capsys, ["--rf-nicam"])
    _assert_common(rep)
    assert rep["rf"]["audio_snr_db"] > 55.0, rep
    nic = rep["rf"]["nicam"]
    assert nic["parity_errors"] == 0 and nic["faw_ok"], rep
    assert nic["left_snr_db"] > 55.0 and nic["right_snr_db"] > 55.0, rep


def test_full_broadcast_stack_a2(capsys):
    """Same stack with A2/Zweikanalton two-carrier stereo instead of
    NICAM — the German-style plan (sound flags on carrier 1 + 2)."""
    rep = _run(capsys, ["--rf-a2", "stereo"])
    _assert_common(rep)
    a2r = rep["rf"]["a2"]
    assert a2r["mode_detected"] == "stereo", rep
    assert a2r["left_snr_db"] > 55.0 and a2r["right_snr_db"] > 55.0, rep


def test_full_broadcast_stack_satellite(capsys):
    """The authentic Astra plan (VERDICT r4 item 8): the same rastered,
    interlaced, service-laden, scrambled PAL — over the SATELLITE FM hop
    with the analog audio subcarrier ladder instead of terrestrial VSB
    (Sky's Videocrypt-on-Astra configuration, two FM sound subcarriers).

    Assembling this smoked out two round-5 defects, both fixed in this
    change series: full-rate teletext used a nonphysical f_bit sine
    run-in that no <=6.9 MHz channel (here, the sound multiplex's video
    low-pass) can carry — the real 10101010 run-in + cosine roll-off
    shaping fixed it for every channel; and the satellite audio
    emphasis FIRs had a fixed tap count whose frequency resolution
    halved at the 27 MHz grid (audio SNR 42/31 dB -> 92/62 after
    fs-scaling the taps).
    """
    base = [f for f in FULL_FLAGS if f not in ("--rf", "--rf-audio")]
    rep = _run(capsys, ["--satellite", "--sat-stereo"], flags=base)
    _assert_common(rep)
    s = rep["satellite"]
    assert s["transparency_db"] > 35.0, rep
    assert len(s["audio_snr_db"]) == 2, rep
    assert all(snr > 40.0 for snr in s["audio_snr_db"]), rep


def test_a2_plus_nicam_refused(capsys):
    """A2 carrier 2 sits inside NICAM's lower sideband; no real channel
    plan carried both — the CLI must refuse, not degrade silently."""
    from color_modem_tpu.cli import main

    with pytest.raises(SystemExit, match="cannot share a channel"):
        main(FULL_FLAGS + ["--rf-nicam", "--rf-a2", "stereo"])
