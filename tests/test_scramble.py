"""Analog pay-TV scrambling (frame/scramble.py).

The system properties: keyed descrambling is BIT-exact (index ops never
touch sample values), the pirate's screen is destroyed by the strong
systems and merely degraded by Discret-style line delay (historically
accurate — Discret 11 was famously weak), and a wrong key doesn't decode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.pipeline import frame_line_index, make_pipeline
from color_modem_tpu.frame.scramble import MODES, descramble, scramble
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

PLAN = get_plan("pal")
L, B, KEY = 64, 2, 0xC0FFEE


def _setup():
    rgb = np.stack(
        [smooth_scene(L, TEST_SAMPLES, seed=s) for s in range(B)]
    ).astype(np.float32)
    enc, dec, _ = make_pipeline(PLAN, "comb3")
    comp = enc(jnp.asarray(rgb), 0)
    g = frame_line_index(PLAN, 0, B, L)
    return rgb, comp, g, dec


@pytest.mark.parametrize("mode", MODES)
def test_descramble_is_bit_exact(mode):
    rgb, comp, g, dec = _setup()
    scr = scramble(PLAN, comp, g, mode, KEY)
    back = descramble(PLAN, scr, g, mode, KEY)
    assert np.array_equal(np.asarray(back), np.asarray(comp))
    # and the decoded picture is therefore identical to the clean path
    assert np.array_equal(np.asarray(dec(back, 0)), np.asarray(dec(comp, 0)))


def test_pirate_view_destroyed():
    """Without the key: cut-and-rotate and the shuffle wreck the picture;
    line delay only degrades it (the authentic weakness)."""
    rgb, comp, g, dec = _setup()
    clean = psnr(np.asarray(dec(comp, 0)), rgb)
    for mode, min_loss in (("cutrotate", 10.0), ("shuffle", 8.0),
                           ("linedelay", 2.0)):
        scr = scramble(PLAN, comp, g, mode, KEY)
        pirate = psnr(np.asarray(dec(scr, 0)), rgb)
        assert clean - pirate > min_loss, (mode, clean, pirate)


@pytest.mark.parametrize("mode", MODES)
def test_wrong_key_does_not_decode(mode):
    rgb, comp, g, dec = _setup()
    scr = scramble(PLAN, comp, g, mode, KEY)
    wrong = descramble(PLAN, scr, g, mode, KEY + 1)
    clean = psnr(np.asarray(dec(comp, 0)), rgb)
    broken = psnr(np.asarray(dec(wrong, 0)), rgb)
    assert clean - broken > 2.0, (mode, clean, broken)


def test_key_schedule_is_stateless():
    """Scrambling a 2-frame block equals scrambling each frame alone with
    its own gline — the closed-form hash has no cross-frame state, so
    frames shard freely (the NCO-philosophy property)."""
    rgb, comp, g, _ = _setup()
    whole = np.asarray(scramble(PLAN, comp, g, "cutrotate", KEY))
    parts = [
        np.asarray(scramble(PLAN, comp[i : i + 1], g[i : i + 1],
                            "cutrotate", KEY))
        for i in range(B)
    ]
    assert np.array_equal(whole, np.concatenate(parts, axis=0))


def test_shuffle_window_gate():
    _, comp, g, _ = _setup()
    with pytest.raises(ValueError, match="divisible"):
        scramble(PLAN, comp[:, :30], g[:, :30], "shuffle", KEY)


def test_ghost_channel_through_scrambled_path():
    """Channel impairments BETWEEN scramble and descramble: a short echo
    mostly follows its line segment through the rotation (only samples
    whose echo crosses a cut point land elsewhere), so the subscriber's
    picture matches the unscrambled ghost within 1 dB — scrambling
    neither amplifies nor hides linear channel damage — and stays well
    above the pirate's."""
    from color_modem_tpu.frame.channel import impair

    rgb, comp, g, dec = _setup()
    kw = dict(ghost_delay_us=1.5, ghost_gain=0.25)
    ghosted = psnr(np.asarray(dec(impair(PLAN, comp, **kw), 0)), rgb)
    scr = scramble(PLAN, comp, g, "cutrotate", KEY)
    rx = descramble(PLAN, impair(PLAN, scr, **kw), g, "cutrotate", KEY)
    through = psnr(np.asarray(dec(rx, 0)), rgb)
    pirate = psnr(np.asarray(dec(impair(PLAN, scr, **kw), 0)), rgb)
    assert abs(ghosted - through) < 1.0, (ghosted, through)
    # the ghost already costs the subscriber ~10 dB, so the margin over
    # the pirate narrows here; the full-strength gap is
    # test_pirate_view_destroyed's clean-channel >10 dB
    assert through - pirate > 3.0, (through, pirate)


def test_cli_scramble(capsys):
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder", "comb3",
                 "--demo", "--pattern", "scene", "--lines", "64",
                 "--scramble", "cutrotate"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["psnr_db"] - rep["scramble"]["pirate_psnr_db"] > 10.0, rep


def test_scramble_rastered_active_region():
    """With ``active_start`` (rastered lines), the blanking interval —
    sync + burst — passes through scramble BIT-untouched while the active
    region scrambles; descramble stays bit-exact (VERDICT r2 item 5: the
    authentic Videocrypt configuration rotated active video inside an
    otherwise ordinary rastered line)."""
    from color_modem_tpu.frame.raster import make_raster

    rp = make_raster(PLAN)
    rgb = np.stack(
        [smooth_scene(L, TEST_SAMPLES, seed=s) for s in range(B)]
    ).astype(np.float32)
    enc, dec, _ = make_pipeline(PLAN, "comb3", raster=True)
    comp = np.asarray(enc(jnp.asarray(rgb), 0))
    g = frame_line_index(PLAN, 0, B, L)
    for mode in MODES:
        scr = np.asarray(scramble(PLAN, jnp.asarray(comp), g, mode, KEY,
                                  active_start=rp.n_blank))
        # blanking (sync + burst) is in the clear, bit-identical
        assert np.array_equal(scr[..., : rp.n_blank],
                              comp[..., : rp.n_blank]), mode
        # active region actually scrambled
        assert not np.array_equal(scr[..., rp.n_blank:],
                                  comp[..., rp.n_blank:]), mode
        back = np.asarray(descramble(PLAN, jnp.asarray(scr), g, mode, KEY,
                                     active_start=rp.n_blank))
        assert np.array_equal(back, comp), mode


def test_cli_scramble_raster_rf(capsys):
    """The flagship conditional-access demo on the AUTHENTIC signal:
    cut-and-rotate on rastered lines (sync/burst clear) through the RF
    hop under sync detection — descrambles to full quality, the pirate
    stays destroyed."""
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder", "comb3",
                 "--demo", "--pattern", "scene", "--lines", "64",
                 "--scramble", "cutrotate", "--raster", "--rf"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["psnr_db"] > 30.0, rep
    assert rep["psnr_db"] - rep["scramble"]["pirate_psnr_db"] > 10.0, rep


def test_cli_scramble_interlaced(capsys):
    """Scramble keyed on the field-sequential line map: interlaced
    roundtrip descrambles cleanly, pirate destroyed."""
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder", "comb2",
                 "--demo", "--pattern", "scene", "--lines", "64",
                 "--scramble", "shuffle", "--interlaced"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # interlaced comb2 on the 64-line scene is itself only ~25.7 dB, so
    # the margin over the shuffled pirate (~16 dB) is narrower than the
    # progressive clean-channel gap; measured 9.6 dB
    assert rep["psnr_db"] - rep["scramble"]["pirate_psnr_db"] > 8.0, rep


def test_cli_scramble_satellite(capsys):
    """Sky's analog Videocrypt really rode Astra's satellite FM: the
    scrambled composite survives the wideband FM hop (its harsher
    spectrum costs some transparency — authentic), the keyed receiver
    descrambles, the pirate's screen stays garbage."""
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder",
                 "delayline", "--demo", "--pattern", "scene",
                 "--lines", "64", "--scramble", "cutrotate",
                 "--satellite"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["psnr_db"] > 26.0, rep
    # the 64-line smooth demo leaves the pirate more residual correlation
    # than a real frame (rotated smooth gradients still resemble the
    # original) — assert the GAP, which is what conditional access sells
    assert rep["scramble"]["pirate_psnr_db"] < rep["psnr_db"] - 8.0, rep
