"""Frame-program tail + 3DMM decode profile (the last unprofiled stages).

docs/PERF.md carries a round-2 "resize + paste + channel assembly ~9 ms"
line that was measured with single-call timings (dispatch-latency
inflated, like the "31 ms decode" the round-3 re-profile corrected).
This script gives the tail the amortized in-jit treatment and decomposes
the 3DMM decode's remaining cost (the compute_norm gathers), at the
production serving shapes (16-frame chunk, 224² raster, 512² output,
bf16 G):

  * full frame program (the estimate_chunk_compute body)
  * 3DMM decode (reconstruct_rotation) and its pieces:
      - corner gathers  face_shape[:, tri[:, k], :]   (round-3: 3.2 ms)
      - corner-BASIS matmul variant: pre-gather the PCA basis/mean rows
        per triangle corner at setup (static, free) and compute corner
        vertices directly as [3*ntri*3, 144] @ [144, B] MXU matmuls —
        no per-frame gather at all
      - one-ring gather  face_norm[:, point_buf, :]    (round-3: 2.0 ms)
      - compute_norm whole (gather vs corner-basis formulation)
  * tail stages in isolation: jax.image.resize (out_hw==rs on the demo
    identity path — suspected ~free), canvas paste, ref broadcast +
    concat assembly, preprocess, YUV 4:2:0 pack

Methodology: experiments/_timing.py (amortized in-jit K-repeats,
interleaved per-variant minima).  Run on the real TPU chip.
"""
import numpy as np
import jax
import jax.numpy as jnp

from experiments import _timing as timing

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.models import pixrefer as px
from voicepuppet_tpu.pipeline import synthesize as syn

C, K, RS, S = 16, 8, 224, 512

cfg = Config()
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=C, seed=1))
angles = jnp.zeros((C, 3), jnp.float32)

synth, identity = syn.SynthesisAssets.demo(cfg, face_model=model, chunk=C)

# ---- corner-basis formulation of the face_norm corner vertices ----
# v_k = mean[tri[:,k]] + (idBase|exBase)[rows(tri[:,k])] @ (id|ex) — the
# SAME dot products as gather(mean + base @ coeff), just with the row
# gather applied to the STATIC basis at setup time instead of to the
# per-frame result.  One [3, ntri, 3, 144] basis tensor, one einsum.
idb = np.asarray(model.idBase, np.float32).reshape(-1, 3, 80)
exb = np.asarray(model.exBase, np.float32).reshape(-1, 3, 64)
mean = np.asarray(model.meanshape, np.float32).reshape(-1, 3)
mean = mean - mean.mean(axis=0, keepdims=True)   # shape_formation recenter
tri0 = np.asarray(model.tri, np.int64) - 1          # [ntri, 3] 0-based
corner_basis = np.concatenate(
    [idb, exb], axis=-1)[tri0]                       # [ntri, 3c, 3xyz, 144]
corner_mean = mean[tri0]                             # [ntri, 3c, 3xyz]
corner_basis_d = jnp.asarray(corner_basis)
corner_mean_d = jnp.asarray(corner_mean)


def corner_verts_gather(face_shape):
    v1 = face_shape[:, fm.tri[:, 0], :]
    v2 = face_shape[:, fm.tri[:, 1], :]
    v3 = face_shape[:, fm.tri[:, 2], :]
    return v1, v2, v3


def corner_verts_basis(id_ex):
    # id_ex [B, 144] -> [B, ntri, 3c, 3xyz]
    v = jnp.einsum("tcxk,bk->btcx", corner_basis_d, id_ex,
                   precision=jax.lax.Precision.HIGHEST)
    return v + corner_mean_d[None]


def face_norm_gather(face_shape):
    v1, v2, v3 = corner_verts_gather(face_shape)
    return jnp.cross(v1 - v2, v2 - v3)


def face_norm_basis(id_ex):
    v = corner_verts_basis(id_ex)
    return jnp.cross(v[:, :, 0] - v[:, :, 1], v[:, :, 1] - v[:, :, 2])


def one_ring(face_norm):
    zeros = jnp.zeros((face_norm.shape[0], 1, 3), face_norm.dtype)
    fn = jnp.concatenate([face_norm, zeros], axis=1)
    v = jnp.sum(fn[:, fm.point_buf, :], axis=2)
    return v / jnp.linalg.norm(v, axis=2, keepdims=True)


def shape_of(co):
    idc, exc = co[:, :80], co[:, 80:144]
    return morph.shape_formation(idc, exc, fm)


# ---- tail stage inputs (production shapes) ----
face224 = jnp.asarray(
    np.random.RandomState(0).rand(C, RS, RS, 3).astype(np.float32))
prog = synth.frame_program_for(identity)
body = prog.__wrapped__
g_params = synth.g_params
bg_pool = jnp.zeros((1, S, S, 3), jnp.float32)
bg_idx = jnp.zeros((C,), jnp.int32)
ref3 = jnp.zeros((S, S, 3), jnp.float32)
frames512 = jnp.asarray(
    np.random.RandomState(1).rand(C, S, S, 3).astype(np.float32))

# paste geometry of the demo identity (out_hw == RS, centered)
(ty0, ty1, tx0, tx1), (sy0, sy1, sx0, sx1) = syn._paste_geometry(
    RS, S // 2, S // 2, 0, 0, S)


def stage_resize(x):
    return jax.image.resize(x, (C, RS, RS, 3), method="linear")


def stage_resize_320(x):
    # a real non-identity resize (ratio_total ~0.7 paste path)
    return jax.image.resize(x, (C, 320, 320, 3), method="linear")


def stage_paste(x):
    canvas = jnp.zeros((C, S, S, 3), jnp.float32)
    return canvas.at[:, ty0:ty1, tx0:tx1, :].set(x[:, sy0:sy1, sx0:sx1, :])


def stage_assembly(canvas):
    ref = jnp.broadcast_to(ref3[None], (C, S, S, 3))
    inputs = jnp.concatenate([ref, canvas], axis=-1)
    fg_ref_b = jnp.broadcast_to(ref3[None], (C, S, S, 3))
    fg_inputs = jnp.concatenate([fg_ref_b, jnp.zeros_like(fg_ref_b)],
                                axis=-1)
    return px.preprocess(inputs), px.preprocess(fg_inputs)


def stage_pack(fr):
    return syn._pack_yuv420(fr)


def tail_whole(x):
    face = stage_resize(x)
    canvas = stage_paste(face)
    a, b = stage_assembly(canvas)
    return a[:, 0, 0, 0] + b[:, 0, 0, 0], canvas


def decode_whole(co):
    rec = morph.reconstruct_rotation(co, fm, angles, image_size=float(RS))
    return rec.face_projection, rec.face_color, rec.z_buffer


def main():
    cases = {
        "frame_program_whole": (
            lambda co: body(g_params, co, angles, bg_pool, bg_idx,
                            ref3, ref3),
            coeff),
        "decode_whole": (decode_whole, coeff),
        "shape_formation": (shape_of, coeff),
        "corner_gather": (corner_verts_gather, shape_of(coeff)),
        # squared output: a bare einsum followed by the harness's
        # carry-sum could be algebraically factored (reduce-of-dot);
        # the square blocks that rewrite at one elementwise pass
        "corner_basis": (
            lambda ie: corner_verts_basis(ie) ** 2, coeff[:, :144]),
        "face_norm_gather": (face_norm_gather, shape_of(coeff)),
        "face_norm_basis": (face_norm_basis, coeff[:, :144]),
        "one_ring_gather": (one_ring, face_norm_gather(shape_of(coeff))),
        "compute_norm_whole": (
            lambda fs: morph.compute_norm(fs, fm), shape_of(coeff)),
        "tail_resize_identity": (stage_resize, face224),
        "tail_resize_320": (stage_resize_320, face224),
        "tail_paste": (stage_paste, face224),
        "tail_assembly": (stage_assembly, stage_paste(face224)),
        "tail_pack_yuv420": (stage_pack, frames512),
        "tail_whole": (tail_whole, face224),
    }
    progs = timing.build_progs(cases, K)
    mins1, minsk = timing.interleaved_minima(progs, rounds=6)
    per = timing.per_iter(mins1, minsk, K)
    print(f"\n== amortized ms per iteration (K={K}, chunk C={C}) ==")
    for name, sec in per.items():
        print(f"{name:24s} {sec * 1e3:8.2f} ms")

    # parity: corner-basis vs gather corner vertices
    fs = shape_of(coeff)
    v1, v2, v3 = corner_verts_gather(fs)
    vb = corner_verts_basis(coeff[:, :144])
    err = max(float(jnp.max(jnp.abs(vb[:, :, k] - v)))
              for k, v in enumerate((v1, v2, v3)))
    scale = float(jnp.max(jnp.abs(v1)))
    print(f"\ncorner-basis max |diff| = {err:.3e}  (scale {scale:.3e})")


if __name__ == "__main__":
    main()
