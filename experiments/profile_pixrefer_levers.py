"""Lever A/Bs for the PixRefer G edge layers (round-4 follow-up to
profile_pixrefer_layers.py, which showed 67% of the 12.95 ms forward in
four low-channel edge layers: encoder_1 2.55 ms @2.6% MFU, encoder_fg_1
1.55 @2.1%, decoder_1 2.26 @3.9%, merged2_decoder_2 2.37 @29%; the
space-to-depth stem was measured 2.4x WORSE — repack traffic dominates).

Levers measured here, each with an on-device exactness check against the
production formulation before timing:

* stems (4x4/s2 conv, ci=6/3): explicit im2col — 16 strided slices of the
  padded input concatenated on channels (XLA fuses into one patch
  materialization), then ONE [B*H'*W', 16*ci] @ [16*ci, 64] matmul that
  the MXU can tile properly (contraction 96/48 vs the conv lowering's
  effective ~6/3).
* deconvs (4x4/s2 transposed conv): parity decomposition — output pixel
  (2m+p, 2n+q) is an exact 2x2 (k3 with one zero tap) conv of the input;
  run the four (p,q) parity convs as four stride-1 convs and interleave
  (depth-to-space), which replaces XLA's dilated-input lowering (half the
  MACs land on inserted zeros) with dense stride-1 convs at the SAME
  useful-FLOP count.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from experiments import _timing as timing

B = 16
S = 512
NGF = 64
K = 16
DT = jnp.bfloat16

rng = np.random.RandomState(0)


def rand(shape, dtype=DT):
    return jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1, dtype)


dn = ("NHWC", "HWIO", "NHWC")


# ---------- stems: conv 4x4/s2 SAME as im2col + matmul ----------
def make_stem(ci, co, h):
    kern = jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.02)

    def base(x):
        return jax.lax.conv_general_dilated(
            x, kern.astype(DT), (2, 2), "SAME", dimension_numbers=dn)

    kmat = kern.reshape(16 * ci, co)

    def im2col(x):
        # SAME for k4/s2: pad (1,1); window rows 2i-1..2i+2 -> padded rows
        # 2i..2i+3
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        hh = h // 2
        cols = []
        for kh in range(4):
            for kw in range(4):
                cols.append(jax.lax.slice(
                    xp, (0, kh, kw, 0), (B, kh + 2 * hh - 1, kw + 2 * hh - 1, ci),
                    (1, 2, 2, 1)))
        patches = jnp.concatenate(cols, axis=-1)          # [B,h/2,h/2,16ci]
        y = jax.lax.dot_general(
            patches.reshape(-1, 16 * ci), kmat.astype(DT),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.reshape(B, hh, hh, co).astype(DT)

    return base, im2col, rand((B, h, h, ci))


# ---------- deconvs: conv_transpose 4x4/s2 SAME as 4 parity convs ------
def _parity_kernels(kern, pad_lo):
    """kern [4,4,ci,co] -> dict[(p,q)] of 3x3 stride-1 kernels such that
    out[2m+p, 2n+q] = (x_pad1 conv Kpq)[m, n].  Derivation: with the
    dilated-input lowering, out[r] = sum_kh xdil[r - pad_lo + kh] K[kh];
    xdil[2i] = x[i], so kh = 2(i - m) - p + pad_lo (d = i - m = a - 1)."""
    ci, co = kern.shape[2], kern.shape[3]
    ks = {}
    for p in range(2):
        for q in range(2):
            k3 = np.zeros((3, 3, ci, co), np.float32)
            for a in range(3):          # d = a-1, kh = 2d - p + pad_lo
                kh = 2 * (a - 1) - p + pad_lo
                if not 0 <= kh <= 3:
                    continue
                for b in range(3):
                    kw = 2 * (b - 1) - q + pad_lo
                    if not 0 <= kw <= 3:
                        continue
                    k3[a, b] = np.asarray(kern)[kh, kw]
            ks[(p, q)] = jnp.asarray(k3)
    return ks


def _calibrate_pad_lo():
    """Determine XLA conv_transpose SAME's leading pad numerically: build
    the parity decomposition under each hypothesis and keep the exact one.
    """
    k = jnp.asarray(rng.randn(4, 4, 2, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    want = jax.lax.conv_transpose(x, k, (2, 2), "SAME",
                                  dimension_numbers=dn)
    for pad_lo in (1, 2, 3):
        ks = _parity_kernels(k, pad_lo)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = {pq: jax.lax.conv_general_dilated(
            xp, k3, (1, 1), "VALID", dimension_numbers=dn)[:, :6, :6]
            for pq, k3 in ks.items()}
        row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)
        row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
        got = jnp.stack([row0, row1], axis=2).reshape(1, 12, 12, 3)
        if float(jnp.max(jnp.abs(got - want))) < 1e-4:
            print(f"conv_transpose SAME pad_lo = {pad_lo}", flush=True)
            return pad_lo
    raise AssertionError("no pad_lo hypothesis matches conv_transpose")


PAD_LO = _calibrate_pad_lo()


def make_deconv(ci, co, h):
    """h = input spatial size; output 2h."""
    kern = jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.02)

    def base(x):
        return jax.lax.conv_transpose(
            x, kern.astype(DT), (2, 2), "SAME", dimension_numbers=dn)

    ks = _parity_kernels(kern, PAD_LO)
    # trim each 3x3 kernel to its nonzero 2x2 window (taps are zero
    # outside): rows a with any nonzero; this keeps useful FLOPs exact.
    trimmed = {}
    for (p, q), k3 in ks.items():
        k3n = np.asarray(k3)
        rs = [a for a in range(3) if np.abs(k3n[a]).max() > 0]
        cs = [b for b in range(3) if np.abs(k3n[:, b]).max() > 0]
        trimmed[(p, q)] = (jnp.asarray(k3n[rs][:, cs]), rs[0], cs[0])

    def parity(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = {}
        for (p, q), (k2, r0, c0) in trimmed.items():
            kh, kw = k2.shape[0], k2.shape[1]
            sub = jax.lax.slice(
                xp, (0, r0, c0, 0),
                (B, r0 + h + kh - 1, c0 + h + kw - 1, ci))
            outs[(p, q)] = jax.lax.conv_general_dilated(
                sub, k2.astype(DT), (1, 1), "VALID", dimension_numbers=dn)
        # interleave parities: [B,h,h,co] x4 -> [B,2h,2h,co]
        row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)
        row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
        y = jnp.stack([row0, row1], axis=2)     # [B,h,2,h,2,co]
        return y.reshape(B, 2 * h, 2 * h, co)

    return base, parity, rand((B, h, h, ci))


cases = {}
checks = []

e1_base, e1_fast, e1_x = make_stem(6, NGF, S)
fg1_base, fg1_fast, fg1_x = make_stem(3, NGF, S)
d1_base, d1_fast, d1_x = make_deconv(2 * NGF, 4, S // 2)
m2d2_base, m2d2_fast, m2d2_x = make_deconv(4 * NGF, NGF, S // 4)

for name, base, fast, x in (
        ("encoder_1", e1_base, e1_fast, e1_x),
        ("encoder_fg_1", fg1_base, fg1_fast, fg1_x),
        ("decoder_1", d1_base, d1_fast, d1_x),
        ("merged2_decoder_2", m2d2_base, m2d2_fast, m2d2_x)):
    cases[f"{name} base"] = (base, x)
    cases[f"{name} lever"] = (fast, x)
    err = jax.jit(lambda x, b=base, f=fast: jnp.max(jnp.abs(
        b(x).astype(jnp.float32) - f(x).astype(jnp.float32))))(x)
    scale = jax.jit(lambda x, b=base: jnp.max(jnp.abs(
        b(x).astype(jnp.float32))))(x)
    print(f"parity {name}: max|Δ| = {float(err):.3e} "
          f"(scale {float(scale):.3e})", flush=True)
    checks.append((name, float(err), float(scale)))

for name, err, scale in checks:
    assert err <= 2e-2 * scale, (name, err, scale)  # bf16 reassociation

progs = timing.build_progs(cases, K)
mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nLEVER A/B (bf16, B={B}, {S}², K={K}):")
for name in progs:
    print(f"  {name:28s} {per_s[name]*1e3:7.2f} ms   "
          f"(t1={mins1[name]*1e3:.0f} tK={minsK[name]*1e3:.0f})")
