"""D2-MAC family tests: round trip, duobinary data, golden parity, sharding.

MAC is the beyond-reference time-multiplexed family (modem/mac.py): no
subcarrier, so its smooth-scene round trip must BEAT every composite
standard (no cross-color by construction) — that physics is test-enforced
here, not just claimed.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from color_modem_tpu.modem import mac
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import color_bars, smooth_scene

L, W = 48, 720


@pytest.fixture(scope="module")
def plan():
    return mac.make_mac_plan(W)


@pytest.fixture(scope="module")
def gline():
    return jnp.arange(L)


# measured 2026-08-18: smooth 51.0 dB, bars 33.2 dB (chroma 3:1 compression
# rings at the bar edges — authentic MAC receiver softness); usual ~1.5 dB
# margin.  The smooth bound EXCEEDS the best composite bound in
# test_roundtrip.ROUNDTRIP_BOUNDS (ntsc comb3, 43.5): MAC's whole point.
MAC_BOUNDS = {"smooth": 49.5, "bars": 31.5}


@pytest.mark.parametrize("scene", sorted(MAC_BOUNDS))
def test_roundtrip(plan, gline, scene):
    img = (smooth_scene(L, W, seed=3) if scene == "smooth"
           else color_bars(L, W)).astype(np.float32)
    out = mac.roundtrip(plan, jnp.asarray(img), gline)
    p = float(psnr(out, jnp.clip(jnp.asarray(img), 0, 1)))
    assert p >= MAC_BOUNDS[scene], f"{scene}: {p:.1f} dB"


def test_beats_composite_smooth(plan, gline):
    """No subcarrier -> no cross-color: MAC must beat NTSC comb3 on the
    very fixture the composite bounds were measured on."""
    from conftest import get_plan
    from color_modem_tpu.frame.pipeline import roundtrip_block

    img = jnp.asarray(smooth_scene(L, W, seed=3).astype(np.float32))
    ntsc = get_plan("ntsc")
    comp = roundtrip_block(ntsc, img[None], gline[None], "comb3")[0]
    p_mac = float(psnr(mac.roundtrip(plan, img, gline), img))
    p_ntsc = float(psnr(comp, img))
    assert p_mac > p_ntsc + 3.0, (p_mac, p_ntsc)


def test_duobinary_levels_and_inverse():
    bits = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.5, (16, 105)
    ).astype(jnp.int32)
    d = mac.duobinary_levels(bits)
    # 3-level alphabet, exactly
    assert bool(jnp.all((d == 0) | (d == 1) | (d == -1)))
    # precoding kills error propagation: bit==1 <-> level 0, always
    assert bool(jnp.all(mac.duobinary_bits(d) == bits))
    # duobinary constraint: adjacent levels never jump -1 <-> +1
    assert bool(jnp.all(jnp.abs(jnp.diff(d, axis=-1)) <= 1))


def test_data_roundtrip_and_sync(plan, gline):
    payload = jax.random.bernoulli(
        jax.random.PRNGKey(5), 0.5, (L, 99)
    ).astype(jnp.int32)
    img = jnp.asarray(smooth_scene(L, W, seed=1).astype(np.float32))
    sig = mac.encode(plan, img, gline, payload)
    sync_ok, bits = mac.decode_data(plan, sig)
    assert bool(sync_ok.all())
    assert bool(jnp.all(bits == payload)), "clean channel must be BER 0"
    # the half-band shaper preserves symbol centers EXACTLY (zero even taps)
    # and tolerates real noise: +/-0.4 around 3 levels -> decision margin
    # 0.2; sigma=0.03 leaves ~6.7 sigma.
    noisy = sig + 0.03 * jax.random.normal(jax.random.PRNGKey(7), sig.shape)
    sync_ok_n, bits_n = mac.decode_data(plan, noisy)
    assert bool(sync_ok_n.all())
    assert bool(jnp.all(bits_n == payload))


def test_line_sequential_parity(plan):
    """Even absolute lines transmit U, odd V — check on one-sided stimuli."""
    gline = jnp.arange(8)
    # pure-U scene: blue-ish vs the gray that zeroes V; use matrix rows to
    # construct component images directly instead
    y = jnp.full((8, W), 0.5)
    u = jnp.full((8, W), 0.3)
    v = jnp.zeros((8, W))
    ycc = jnp.stack([y, u, v])
    rgb = jnp.einsum(
        "ij,jlw->ilw", jnp.asarray(plan.ycc_to_rgb, jnp.float32), ycc
    )
    sig = mac.encode(plan, rgb, gline)
    cfg = plan.cfg
    seg = sig[..., cfg.chroma_start : cfg.chroma_start + cfg.chroma_len]
    dev = jnp.abs(seg - cfg.pedestal).max(axis=-1)
    assert bool(jnp.all(dev[0::2] > 0.1)), "even lines must carry U"
    assert bool(jnp.all(dev[1::2] < 1e-3)), "odd lines must rest (V = 0)"


def test_golden_parity(plan, gline):
    """Closed-form JAX path == sequential per-line NumPy oracle."""
    from color_modem_tpu.golden import mac as gmac

    img = smooth_scene(L, W, seed=9).astype(np.float32)
    rng = np.random.default_rng(0)
    payload_np = rng.integers(0, 2, size=(L, 99))

    g_sig = gmac.encode_frame(plan, img, 0, payload=list(payload_np))
    j_sig = mac.encode(
        plan, jnp.asarray(img), gline, jnp.asarray(payload_np, jnp.int32)
    )
    assert float(psnr(j_sig, jnp.asarray(g_sig, jnp.float32))) >= 60.0

    g_rgb = gmac.decode_frame(plan, g_sig, 0)
    j_rgb = mac.decode(plan, jnp.asarray(g_sig, jnp.float32), gline)
    assert float(psnr(j_rgb, jnp.asarray(g_rgb, jnp.float32))) >= 60.0

    ok, bits = gmac.decode_data_line(plan, g_sig[3])
    assert ok and list(bits) == list(payload_np[3])


def test_sharded_equivalence(plan):
    """Sharded MAC == unsharded on every mesh factoring.

    Tolerance 1e-6 relative, NOT bit-identical, for the same reason as
    SECAM (tests/test_sharding.py header): the resampling matmuls'
    accumulation order is shape-dependent on this backend, and the
    device-local M dimension changes with the mesh (measured <=3.5e-7).
    The QAM paths stay bit-identical because their Toeplitz matrices are
    banded per-row dots; the halo logic itself is exercised identically.
    """
    from color_modem_tpu.parallel import make_mesh
    from color_modem_tpu.parallel.sharded import make_sharded_mac_pipeline

    B = 8
    batch = jnp.asarray(
        np.stack([smooth_scene(L, W, seed=s) for s in range(B)],
                 dtype=np.float32)
    )
    g = (jnp.arange(B)[:, None] * plan.cfg.total_lines + jnp.arange(L))
    want_sig = mac.encode(plan, batch, g)
    want_rgb = mac.decode(plan, want_sig, g)

    for mesh in (make_mesh(2, 4), make_mesh(8, 1), make_mesh(1, 8)):
        enc, dec, _ = make_sharded_mac_pipeline(plan, mesh)
        got_sig = np.asarray(enc(batch))
        got_rgb = np.asarray(dec(want_sig))
        np.testing.assert_allclose(got_sig, np.asarray(want_sig),
                                   rtol=1e-6, atol=1e-6, err_msg=str(mesh))
        np.testing.assert_allclose(got_rgb, np.asarray(want_rgb),
                                   rtol=1e-6, atol=1e-6, err_msg=str(mesh))


def test_packet_sound_roundtrip(plan):
    """NICAM-coded audio in the duobinary burst: clean-channel transport
    is exactly the NICAM quantization floor (~60 dB companded SNR)."""
    n_lines = 576
    gline = jnp.arange(n_lines)
    cap = mac.sound_capacity(plan, n_lines)
    assert cap >= 78  # 576 lines x 99 bits / 728
    n = cap * 32
    t = np.arange(n) / 32000.0
    left = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    right = (0.5 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    payload, n_f = mac.pack_sound(plan, jnp.asarray(left),
                                  jnp.asarray(right), n_lines)
    img = jnp.asarray(smooth_scene(n_lines, W, seed=2).astype(np.float32))
    sig = mac.encode(plan, img, gline, payload)
    ok, bits = mac.decode_data(plan, sig)
    assert bool(ok.all())
    gl, gr, rep = mac.unpack_sound(plan, bits, n_f)
    assert int(jnp.sum(rep["parity_errors"])) == 0
    for got, want in ((gl, left), (gr, right)):
        snr = -10.0 * np.log10(float(jnp.mean((got - jnp.asarray(want)) ** 2))
                               + 1e-12)
        assert snr >= 55.0, snr  # 14->10-bit companding floor ~60 dB


def test_packet_sound_survives_satellite(plan):
    """The full D2-MAC service over its real channel: picture + packet
    sound through the FM satellite hop at CNR 20 — audio must come back
    at the companding floor with zero parity errors."""
    from color_modem_tpu.frame import satellite as sat

    n_lines = 64
    gline = jnp.arange(n_lines)
    n_f = mac.sound_capacity(plan, n_lines)
    n = n_f * 32
    rng = np.random.default_rng(3)
    left = (0.5 * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)
    right = (0.5 * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)
    payload, n_f = mac.pack_sound(plan, jnp.asarray(left),
                                  jnp.asarray(right), n_lines)
    img = jnp.asarray(smooth_scene(n_lines, W, seed=4).astype(np.float32))
    sig = mac.encode(plan, img, gline, payload)
    sp = sat.make_sat_plan(plan.cfg.fs, plan.cfg.samples_per_line,
                           dispersal=0.1)
    rx = sat.sat_roundtrip(sp, sig[None], gline=gline[None],
                           key=jax.random.PRNGKey(9), cnr_db=20.0)[0]
    ok, bits = mac.decode_data(plan, rx)
    assert bool(ok.all())
    gl, gr, rep = mac.unpack_sound(plan, bits, n_f)
    assert int(jnp.sum(rep["parity_errors"])) == 0
    snr = -10.0 * np.log10(float(jnp.mean((gl - jnp.asarray(left)) ** 2))
                           + 1e-12)
    assert snr >= 50.0, snr


def test_dmac_variant(gline):
    """Full-rate D-MAC (20.25 Mbaud, samples_per_symbol=1): double the
    payload (204 vs 99 bits/line), bit-exact clean, IDENTICAL picture
    path (the analog segments don't change), golden parity."""
    from color_modem_tpu.golden import mac as gmac

    d2 = mac.make_mac_plan(W, "d2")
    dm = mac.make_mac_plan(W, "d")
    assert dm.cfg.samples_per_symbol == 1
    cap = dm.cfg.data_symbols - len(dm.cfg.line_sync_word)
    assert cap == 204 and dm.cfg.data_symbols == 210
    # burst region identical: [0, 210) grid samples in both variants
    assert (dm.cfg.samples_per_symbol * dm.cfg.data_symbols
            == d2.cfg.samples_per_symbol * d2.cfg.data_symbols)

    img = smooth_scene(L, W, seed=3).astype(np.float32)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, size=(L, cap)), jnp.int32)
    sig = mac.encode(dm, jnp.asarray(img), gline, payload)
    ok, bits = mac.decode_data(dm, sig)
    assert bool(ok.all())
    assert bool(jnp.all(bits == payload))
    p_d = float(psnr(mac.decode(dm, sig, gline),
                     jnp.clip(jnp.asarray(img), 0, 1)))
    p_d2 = float(psnr(mac.roundtrip(d2, jnp.asarray(img), gline),
                      jnp.clip(jnp.asarray(img), 0, 1)))
    assert p_d == pytest.approx(p_d2, abs=0.05), (p_d, p_d2)

    # golden mirror handles the variant (hash updated same commit)
    g_sig = gmac.encode_frame(dm, img, 0,
                              payload=list(np.asarray(payload)))
    assert float(psnr(jnp.asarray(g_sig, jnp.float32), sig)) >= 60.0
    okg, bitsg = gmac.decode_data_line(dm, g_sig[5])
    assert okg and list(bitsg) == list(np.asarray(payload[5]))

    # and the burst survives its real channel: satellite FM at CNR 18
    from color_modem_tpu.frame import satellite as sat

    sp = sat.make_sat_plan(dm.cfg.fs, dm.cfg.samples_per_line)
    rx = sat.sat_roundtrip(sp, sig[None], key=jax.random.PRNGKey(2),
                           cnr_db=18.0)[0]
    ok2, bits2 = mac.decode_data(dm, rx)
    assert bool(ok2.all())
    ber = float(jnp.mean((bits2 != payload).astype(jnp.float32)))
    assert ber < 1e-3, ber
