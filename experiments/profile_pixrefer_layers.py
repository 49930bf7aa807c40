"""Per-layer profile of the PixRefer generator on the real TPU (round-3
VERDICT next #3: "give PixRefer G the raster treatment").

The serving configuration (bf16 activations, f32 params, B=16 frames,
512²) measured ~14 ms/chunk ≈ 46 TFLOP/s ≈ 23% of v5e bf16 peak — this
script decomposes that into per-layer (conv/deconv + StatelessBatchNorm +
activation) costs, with an analytic FLOP count per layer so each row gets
an MFU number (the results land in docs/PERF.md).

Each layer runs in ISOLATION with its production input shape, K repeats
inside one jit (carried data dependence; CLAUDE.md timing rules),
interleaved across rounds with per-variant minima.  The full forward is
timed the same way, so fusion wins show up as (sum-of-layers − whole).

Also A/Bs the one shape-level lever the profile can justify without
touching model semantics: a space-to-depth stem for the 6-ch/3-ch
encoder_1 convs (4x4/s2 conv on [512²,6] == 2x2/s1 conv on the 2x2
depth-packed [256²,24] — 4x better MXU lane occupancy on the input
dimension).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from experiments import _timing as timing

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models import pixrefer as px

cfg = Config()
B = 16                      # serving chunk (pipeline/synthesize.py)
S = cfg.pixrefer.img_size   # 512
NGF = cfg.pixrefer.ngf      # 64
K = 16
DT = jnp.bfloat16           # serving dtype (params f32, activations bf16)
PEAK_TFLOPS = 197.0         # v5e bf16

rng = np.random.RandomState(0)


def rand(shape, dtype=DT):
    return jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1, dtype)


# ---- layer spec, mirroring models/pixrefer.py Generator exactly ----
# (kind, name, h_in, c_in, c_out, act) — stride 2 everywhere; conv output
# is h_in/2, deconv output is h_in*2.  act: activation applied BEFORE the
# conv (as in the model), bn: StatelessBatchNorm applied AFTER.
def gen_spec(ngf):
    spec = []
    # face-render encoder (6ch stem) + fg encoder (3ch stem)
    spec.append(("conv", "encoder_1", S, 6, ngf, None, False))
    h = S // 2
    for i, (ci, co) in enumerate(((ngf, ngf * 2), (ngf * 2, ngf * 2),
                                  (ngf * 2, ngf * 4))):
        spec.append(("conv", f"encoder_{i + 2}", h, ci, co, "lrelu", True))
        h //= 2
    spec.append(("conv", "encoder_fg_1", S, 3, ngf, None, False))
    h = S // 2
    for i, (ci, co) in enumerate(((ngf, ngf * 2), (ngf * 2, ngf * 2),
                                  (ngf * 2, ngf * 4))):
        spec.append(("conv", f"encoder_fg_{i + 2}", h, ci, co, "lrelu",
                     True))
        h //= 2
    # merged trunk: concat(256+256) at S/16
    h = S // 16
    for i, (ci, co) in enumerate(((ngf * 8, ngf * 4), (ngf * 4, ngf * 8),
                                  (ngf * 8, ngf * 8), (ngf * 8, ngf * 8))):
        spec.append(("conv", f"merged_encoder_{i + 2}", h, ci, co, "lrelu",
                     True))
        h //= 2
    # merged decoders (skip concats double c_in after the first)
    h = S // 256                     # 2
    for name, ci, co in (("merged_decoder_5", ngf * 8, ngf * 8),
                         ("merged_decoder_4", ngf * 16, ngf * 8),
                         ("merged_decoder_3", ngf * 16, ngf * 4),
                         ("merged_decoder_2", ngf * 8, ngf * 4)):
        spec.append(("deconv", name, h, ci, co, "relu", True))
        h *= 2
    # merged2 decoders against the face encoder stream
    for name, ci, co in (("merged2_decoder_4", ngf * 8, ngf * 2),
                         ("merged2_decoder_3", ngf * 4, ngf * 2),
                         ("merged2_decoder_2", ngf * 4, ngf)):
        spec.append(("deconv", name, h, ci, co, "relu", True))
        h *= 2
    spec.append(("deconv", "decoder_1", h, ngf * 2, 4, "relu", False))
    return spec


SPEC = gen_spec(NGF)


def layer_flops(kind, h_in, c_in, c_out):
    """MACs*2 for a 4x4 stride-2 (de)conv at batch B.  Both directions
    touch 16*c_in*c_out weights per SMALL-side pixel."""
    small = (h_in // 2) if kind == "conv" else h_in
    return 2.0 * B * small * small * 16 * c_in * c_out


def make_layer_case(kind, h_in, c_in, c_out, act, bn):
    """Standalone (act -> conv/deconv -> BN) block with f32 params and
    DT activations — exactly what flax runs for one generator layer."""
    kern = jnp.asarray(
        rng.randn(4, 4, c_in, c_out).astype(np.float32) * 0.02)
    bias = jnp.zeros((c_out,), jnp.float32)
    gamma = jnp.ones((c_out,), jnp.float32)
    beta = jnp.zeros((c_out,), jnp.float32)

    def f(x):
        if act == "lrelu":
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
        elif act == "relu":
            x = jax.nn.relu(x)
        k = kern.astype(DT)
        if kind == "conv":
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = jax.lax.conv_transpose(
                x, k, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias.astype(DT)
        if bn:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - mean ** 2
            y = ((yf - mean) * jax.lax.rsqrt(var + 1e-5) * gamma
                 + beta).astype(DT)
        return y

    return f, rand((B, h_in, h_in, c_in))


# ---- space-to-depth stem lever ----
def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def make_s2d_stem(c_in, c_out):
    """4x4/s2 SAME conv == (pad 1) -> space-to-depth -> 2x2/s1 VALID conv:
    SAME padding for kernel 4 / stride 2 is (1,1), so output row i taps
    input rows 2i-1..2i+2; pre-padding by one shifts those to 2i..2i+3 =
    packed block rows i,i+1 — a clean 2x2 window in block space.  The 4x4
    kernel splits by tap parity into the four packed depth groups.  Same
    taps, same MXU f32 accumulation — and 4x the input-lane occupancy."""
    kern = jnp.asarray(
        rng.randn(4, 4, c_in, c_out).astype(np.float32) * 0.02)
    # [4,4,ci,co] -> [2,2, (p,q,ci) packed like space_to_depth, co]
    k = kern.reshape(2, 2, 2, 2, c_in, c_out)       # (kh2, p, kw2, q)
    k = k.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c_in, c_out)

    def f(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xp = space_to_depth(xp)
        return jax.lax.conv_general_dilated(
            xp, k.astype(DT), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def ref(x):
        return jax.lax.conv_general_dilated(
            x, kern.astype(DT), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return f, ref, rand((B, S, S, c_in))


# ---- full forward ----
gen = px.Generator(NGF, 4, None, dtype=DT)
g_params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 6)),
                    jnp.zeros((1, S, S, 3)))["params"]
full_in = rand((B, S, S, 6), jnp.float32)
full_fg = rand((B, S, S, 3), jnp.float32)


def full_forward(x):
    return gen.apply({"params": g_params}, x, full_fg)


cases = {"FULL G forward": (full_forward, full_in)}
flops = {"FULL G forward": sum(layer_flops(k, h, ci, co)
                               for k, _, h, ci, co, _, _ in SPEC)}
for kind, name, h_in, c_in, c_out, act, bn in SPEC:
    f, x = make_layer_case(kind, h_in, c_in, c_out, act, bn)
    cases[name] = (f, x)
    flops[name] = layer_flops(kind, h_in, c_in, c_out)

# stem lever variants
s2d6, ref6, x6 = make_s2d_stem(6, NGF)
s2d3, ref3, x3 = make_s2d_stem(3, NGF)
cases["stem6 s2d (lever)"] = (s2d6, x6)
cases["stem3 s2d (lever)"] = (s2d3, x3)
flops["stem6 s2d (lever)"] = layer_flops("conv", S, 6, NGF)
flops["stem3 s2d (lever)"] = layer_flops("conv", S, 3, NGF)

# parity of the s2d rewrite (exact in bf16: same taps, same accumulation
# per output — only the lane packing changes)
pe6 = jax.jit(lambda x: jnp.max(jnp.abs(
    s2d6(x).astype(jnp.float32) - ref6(x).astype(jnp.float32))))(x6)
pe3 = jax.jit(lambda x: jnp.max(jnp.abs(
    s2d3(x).astype(jnp.float32) - ref3(x).astype(jnp.float32))))(x3)
print(f"s2d stem parity: max|Δ| 6ch={float(pe6):.3e} 3ch={float(pe3):.3e}",
      flush=True)

progs = timing.build_progs(cases, K)
mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nPER-LAYER PROFILE (bf16 acts, B={B}, {S}², K={K}):")
print(f"  {'layer':26s} {'ms':>7s} {'GFLOP':>8s} {'TFLOP/s':>8s} "
      f"{'MFU%':>6s}")
total_layers = 0.0
for name in progs:
    per = per_s[name]
    gf = flops[name] / 1e9
    tf = gf / per / 1e3 if per > 0 else float("inf")
    print(f"  {name:26s} {per*1e3:7.2f} {gf:8.1f} {tf:8.1f} "
          f"{100*tf/PEAK_TFLOPS:6.1f}")
    if name in {n for _, n, *_ in SPEC}:
        total_layers += per
full = per_s.get("FULL G forward", float("nan"))
print(f"\n  sum of layers {total_layers*1e3:.2f} ms vs whole forward "
      f"{full*1e3:.2f} ms (fusion/overlap delta "
      f"{(total_layers-full)*1e3:+.2f} ms)")
