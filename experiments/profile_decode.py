"""Profile the 3DMM decode path on the real TPU (VERDICT r2 weak #2).

The dispatch+fetch round-trip through the axon tunnel has a ~27 ms floor,
so single-call timings are meaningless.  Each variant here is repeated
K times inside ONE jit via lax.fori_loop (with a data dependence through
the carry so XLA cannot hoist it), and per-iteration compute is
(t_K - t_1) / (K - 1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from experiments import _timing as timing

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph

B = 16
K = 16
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))
angles = jnp.zeros((B, 3), jnp.float32)

id_c, ex_c, tex_c, _, gamma, translation = morph.split_coeff(coeff)
face_shape = morph.shape_formation(id_c, ex_c, fm)
face_tex = morph.texture_formation(tex_c, fm)
rot = morph.rotation_matrix(angles)
face_norm = morph.compute_norm(face_shape, fm)
fn_pad = jnp.concatenate(
    [face_norm, jnp.zeros((B, 1, 3), jnp.float32)], axis=1)



def shape_default(c):
    i, e, t, _, _, _ = morph.split_coeff(c)
    flat = (jnp.einsum("ij,aj->ai", fm.id_base, i)
            + jnp.einsum("ij,aj->ai", fm.ex_base, e)
            + fm.meanshape.reshape(1, -1))
    return flat.reshape(flat.shape[0], -1, 3) - fm.recenter[None]


def face_norm_only(fs):
    v1 = fs[:, fm.tri[:, 0], :]
    v2 = fs[:, fm.tri[:, 1], :]
    v3 = fs[:, fm.tri[:, 2], :]
    return jnp.cross(v1 - v2, v2 - v3)


cases = {
    "full_reconstruct_rotation":
        (lambda c: morph.reconstruct_rotation(c, fm, angles).face_color,
         coeff),
    "shape_formation_HIGHEST":
        (lambda c: morph.shape_formation(*morph.split_coeff(c)[:2], fm),
         coeff),
    "shape_formation_default_prec": (shape_default, coeff),
    "texture_formation":
        (lambda c: morph.texture_formation(morph.split_coeff(c)[2], fm),
         coeff),
    "compute_norm_full": (lambda fs: morph.compute_norm(fs, fm),
                          face_shape),
    "corner_gathers_cross": (face_norm_only, face_shape),
    "point_buf_ring_gather":
        (lambda fn: jnp.sum(fn[:, fm.point_buf, :], axis=2), fn_pad),
    "illumination":
        (lambda ft: morph.illumination_layer(ft, face_norm, gamma)[0],
         face_tex),
    "projection":
        (lambda fs: morph.projection_layer(fs, rot, translation)[0],
         face_shape),
}

progs = timing.build_progs(cases, K)

mins1, minsK = timing.interleaved_minima(progs, rounds=8)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration compute (ms, B={B} frames, K={K}):")
for name in progs:
    per = per_s[name]
    print(f"  {name:32s} {per*1e3:8.2f}   (t1={mins1[name]*1e3:.1f} "
          f"tK={minsK[name]*1e3:.1f})")
