"""WST teletext packet service (frame/teletext.py).

Hamming-8/4 code properties, full-rate packet round-trips on the wide
grid, single-bit correction under noise, and the full-system test: a
teletext page embedded in a PAL composite survives the channel while the
picture decodes around it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from color_modem_tpu.frame import teletext as tx
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import PAL, SECAM
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

WIDE = 1440  # 27 MHz grid: the one that supports full-rate WST


@pytest.fixture(scope="module")
def plan():
    return make_plan(PAL(), WIDE)


# ---------------------------------------------------------------------------
# Hamming 8/4 code properties
# ---------------------------------------------------------------------------


def test_hamming_code_min_distance_4():
    cw = tx._HAM84_CODE
    for i in range(16):
        for j in range(i + 1, 16):
            d = bin(int(cw[i]) ^ int(cw[j])).count("1")
            assert d >= 4, (i, j, d)


def test_hamming_roundtrip_and_single_error_correction():
    nibbles = jnp.arange(16)
    bits = tx.hamming84_encode(nibbles)
    val, ok = tx.hamming84_decode(bits)
    np.testing.assert_array_equal(np.asarray(val), np.arange(16))
    assert bool(jnp.all(ok == 1))
    # every single-bit flip corrects
    for b in range(8):
        flipped = bits.at[:, b].set(1 - bits[:, b])
        val, ok = tx.hamming84_decode(flipped)
        np.testing.assert_array_equal(np.asarray(val), np.arange(16))
        assert bool(jnp.all(ok == 1))


def test_hamming_double_error_detected_not_miscorrected():
    bits = tx.hamming84_encode(jnp.arange(16))
    flipped = bits.at[:, 0].set(1 - bits[:, 0]).at[:, 5].set(1 - bits[:, 5])
    _, ok = tx.hamming84_decode(flipped)
    assert bool(jnp.all(ok == 0))


# ---------------------------------------------------------------------------
# Packet round-trips
# ---------------------------------------------------------------------------


def test_wst_needs_wide_grid():
    narrow = make_plan(PAL(), 720)
    with pytest.raises(ValueError, match="1440"):
        tx.wst_spec(narrow)


def test_page_roundtrip_clean(plan):
    rows = ["CEEFAX 1", "NEWS HEADLINES AT TEN", "WEATHER: RAIN  19C"]
    waves = tx.encode_page(plan, 1, 0x00, rows, header="P100 MON 18 AUG")
    pkts = tx.decode_packets(plan, waves)
    assert len(pkts) == 4
    hdr = pkts[0]
    assert hdr.packet == 0 and hdr.address_ok and hdr.header_ok
    assert hdr.magazine == 1 and hdr.page == 0x00
    assert hdr.text.rstrip() == "P100 MON 18 AUG"
    for i, want in enumerate(rows):
        p = pkts[i + 1]
        assert p.packet == i + 1 and p.address_ok
        assert bool(p.parity_ok.all())
        assert p.text.rstrip() == want
    page = tx.render_page(pkts)
    assert page.splitlines()[0] == "P100 MON 18 AUG"
    assert page.splitlines()[2] == rows[1]


def test_page_roundtrip_secam(plan):
    # the 625-line FM standard carries the same VBI service
    sp = make_plan(SECAM(), WIDE)
    waves = tx.encode_page(sp, 3, 0x15, ["ANTIOPE"], header="SUB")
    pkts = tx.decode_packets(sp, waves)
    assert pkts[0].page == 0x15 and pkts[1].text.rstrip() == "ANTIOPE"


def test_subcode_roundtrip(plan):
    bits = tx.header_packet_bits(2, 0x34, subcode=0x1ABC, text="X")
    waves = tx.encode_data_line(plan, tx.wst_spec(plan), bits[None])
    p = tx.decode_packets(plan, waves)[0]
    assert p.magazine == 2 and p.page == 0x34 and p.subcode == 0x1ABC


def test_noise_hamming_corrects(plan):
    # moderate channel noise: margins shrink but Hamming + parity hold
    rows = ["0123456789" * 4]
    waves = tx.encode_page(plan, 1, 0x42, rows, header="HDR")
    noisy = waves + 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), waves.shape
    )
    pkts = tx.decode_packets(plan, noisy)
    assert pkts[0].page == 0x42 and pkts[0].address_ok
    assert pkts[1].text == rows[0]
    assert all(p.margin > 0.1 for p in pkts)


def test_corrupted_char_flags_parity(plan):
    waves = tx.encode_page(plan, 1, 0x10, ["HELLO WORLD"])
    spec = tx.wst_spec(plan)
    # force one character cell to all-ones (0x7F + wrong parity bit):
    # 8 ones is even parity, so the decoder must flag it
    spb = spec.samples_per_bit(plan.fs)
    run_in = spec.run_in_cycles * spb * 2  # alt run-in: 2 bits per cycle
    start = len(spec.start_bits) * spb
    # char 2 ('L') of the payload = byte 2+2=4 -> bits 32..40 after framing
    lo = int(run_in + start + 32 * spb)
    hi = int(run_in + start + 40 * spb)
    waves = waves.at[1, lo:hi].set(spec.level)
    pkts = tx.decode_packets(plan, waves)
    p = pkts[1]
    assert not bool(p.parity_ok.all())
    assert p.text[2] == "?"
    assert p.text[:2] == "HE" and p.text[3:].rstrip() == "LO WORLD"


# ---------------------------------------------------------------------------
# Full system: page rides the composite through the channel
# ---------------------------------------------------------------------------


def test_page_in_composite_through_channel(plan):
    enc, dec, _ = make_pipeline(plan, "notch")
    lines = 48
    rgb = smooth_scene(lines, WIDE, seed=7).astype(np.float32)[None]
    comp = enc(jnp.asarray(rgb), 0)
    rows = ["TELETEXT RIDES THE VBI", "THROUGH THE CHANNEL"]
    waves = tx.encode_page(plan, 1, 0x00, rows, header="P100")
    n_data = waves.shape[0]
    comp = comp.at[0, :n_data].set(waves)
    rx = impair(plan, comp, noise_sigma=0.01, key=jax.random.PRNGKey(5))
    pkts = tx.decode_packets(plan, rx[0, :n_data])
    assert pkts[0].text.rstrip() == "P100"
    assert [p.text.rstrip() for p in pkts[1:]] == rows
    # and the picture below still decodes
    out = dec(rx, 0)
    assert float(
        psnr(out[0, :, n_data + 2:], rgb[0, :, n_data + 2:])
    ) > 25.0
