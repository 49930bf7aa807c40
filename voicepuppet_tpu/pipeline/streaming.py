"""Online (chunked) synthesis — a serving capability beyond the reference.

The reference (and the batch ``Synthesizer``) needs the whole audio clip
before producing any frame (infer_bfmvid.py:182-243).  This module
synthesizes incrementally: feed PCM as it arrives, get video frames back
with bounded latency — the talking-head-from-a-live-mic serving shape.

Exactness model:
  * The GRU is *exactly* streamable: running chunk-by-chunk with the
    carried hidden state (BFMNet.decode rnn_state) reproduces the
    whole-clip recurrence bit-for-bit given identical encoder inputs.
  * The convolutional trunk (MfccNet, temporal receptive field ~22 video
    frames) is streamed with overlap: each step encodes
    ``ctx_left + chunk + ctx_right`` frames and keeps the middle
    ``chunk`` — interior frames see their full receptive field, so the
    approximation error vs the whole-clip run decays geometrically in
    the context sizes (pinned by tests/test_streaming.py).
  * Latency = ``ctx_right`` frames (default 12 ≈ 0.48 s at 25 fps) plus
    one chunk.  Measured presets (experiments/streaming_quality.py,
    docs/PERF.md "Reduced-context (low-latency) serving"): the trunk's effective right
    context is ≤3 frames, so ``chunk=4, ctx_right=3`` cuts algorithmic
    first-frame latency 4x with interior frames at f32-noise parity;
    only fully causal (``ctx_right=0``) pays a real steady-state cost.

One jitted program per stream (static window shapes), reusing the batch
Synthesizer's frame program for rendering.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.pipeline.synthesize import (Identity, Synthesizer,
                                                 splice_coeff_sequence)


class StreamingCoeffPredictor:
    """pcm chunks in -> expression-coefficient chunks out.

    Maintains the GRU hidden state across chunks and the pcm lookback /
    lookahead needed by the conv trunk.  All shapes static: one compile.
    """

    def __init__(self, synth: Synthesizer, chunk: int = 16,
                 ctx_left: int = 24, ctx_right: int = 12,
                 rng_seed: int = 0):
        self.synth = synth
        self.cfg = synth.cfg
        self.chunk = chunk
        self.ctx_left = ctx_left
        self.ctx_right = ctx_right
        cfg = self.cfg
        self._scale = cfg.frame_mfcc_scale           # 5 mel rows / frame
        self._hop = cfg.mel.hop_step
        self._win = cfg.mel.win_length
        self._fps_samples = cfg.frame_wav_scale      # 640 pcm / frame
        w_frames = ctx_left + chunk + ctx_right
        # pcm span covering W frames of mel rows (generator.py:478)
        self._pcm_len = self._hop * (w_frames * self._scale - 1) + self._win
        self._buffer = np.zeros((0,), np.float32)
        self._buffer_start = 0        # absolute sample index of buffer[0]
        self._next_frame = 0                          # next frame to emit
        self._rng = np.random.RandomState(rng_seed)
        self._state = None
        self._done = False

        model = synth.bfmnet
        variables = synth.bfm_vars
        n_layers = synth.cfg.bfmnet.rnn_layers
        units = synth.cfg.bfmnet.rnn_hidden_size

        def program(pcm_window, ears, state):
            mfcc = synth.frontend(pcm_window)         # [1, W*5, 80]

            def run(m, mfcc, ears, state):
                enc = m.encode(mfcc, train=False)     # [1, W, emb]
                mid = enc[:, ctx_left:ctx_left + chunk]
                seq = jnp.full((1,), chunk, jnp.int32)
                return m.decode(mid, ears, seq, train=False,
                                rnn_state=state, return_rnn_state=True)

            return model.apply(variables, mfcc, ears, state, method=run)

        self._program = jax.jit(program)
        self._zero_state = [jnp.zeros((1, units), jnp.float32)
                            for _ in range(n_layers)]

    @property
    def frames_buffered(self) -> int:
        """Frames of audio received but not yet emitted."""
        total = ((self._buffer_start + self._buffer.shape[0])
                 // self._fps_samples)
        return max(0, total - self._next_frame)

    def feed(self, pcm: np.ndarray) -> List[np.ndarray]:
        """Append pcm; return zero or more [chunk, 64] coefficient
        blocks as they become computable (each needs ctx_right frames of
        lookahead)."""
        if self._done:
            raise RuntimeError(
                "feed() after flush(): the GRU state was finalized on a "
                "partial last chunk — start a new StreamingCoeffPredictor")
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(pcm, np.float32)])
        out = []
        while True:
            block = self._try_step(flush=False)
            if block is None:
                self._trim_buffer()
                return out
            out.append(block)

    def _trim_buffer(self):
        """Drop pcm no future window can read (everything left of
        ``next_frame - ctx_left``) — a live stream otherwise accumulates
        its whole history and feed() turns O(total)."""
        keep_abs = max(0, (self._next_frame - self.ctx_left)
                       * self._scale * self._hop)
        drop = keep_abs - self._buffer_start
        if drop > 0:
            self._buffer = self._buffer[drop:]
            self._buffer_start = keep_abs

    def flush(self) -> List[np.ndarray]:
        """End of stream: zero-pad the lookahead and emit the tail
        (partial last chunk trimmed to the frames actually fed)."""
        self._done = True
        out = []
        while True:
            block = self._try_step(flush=True)
            if block is None:
                return out
            out.append(block)

    def _try_step(self, flush: bool) -> Optional[np.ndarray]:
        s = self._next_frame
        total_samples = self._buffer_start + self._buffer.shape[0]
        total_frames = total_samples // self._fps_samples
        avail = total_frames - s
        if avail <= 0:
            return None
        if not flush and avail < self.chunk + self.ctx_right:
            return None
        emit = min(self.chunk, avail)

        # pcm window for frames [s - ctx_left, s + chunk + ctx_right),
        # zero-padded at the stream edges (the conv trunk's SAME padding
        # at the clip boundary becomes mel-of-silence here — the
        # documented start-of-stream approximation).  Sample indices are
        # absolute; the buffer holds [_buffer_start, total_samples).
        start_f = s - self.ctx_left
        start_sample = start_f * self._scale * self._hop
        window = np.zeros((self._pcm_len,), np.float32)
        lo = max(self._buffer_start, start_sample)
        hi = min(total_samples, start_sample + self._pcm_len)
        if hi > lo:
            window[lo - start_sample:hi - start_sample] = \
                self._buffer[lo - self._buffer_start:
                             hi - self._buffer_start]

        # inference ear signal: random sub-0.01 (infer_bfmvid.py:182)
        ears = self._rng.rand(1, self.chunk, 1).astype(np.float32) / 100.0
        state = self._state if self._state is not None else \
            self._zero_state
        exp, new_state = self._program(jnp.asarray(window[None]),
                                       jnp.asarray(ears), state)
        # the carried state must be the recurrence after the frames we
        # actually EMITTED; with a full chunk that's the final state
        self._state = new_state if emit == self.chunk else None
        if emit < self.chunk:
            self._done = True
        self._next_frame = s + emit
        # returned as a DEVICE array (no fetch): the renderer consumes it
        # on device, so prediction of block k+1 pipelines behind the
        # render of block k instead of stalling on a host round-trip
        return exp[0, :emit]


class StreamingSynthesizer:
    """Full streaming loop: pcm chunks in -> rendered frame blocks out.

    Reuses the batch Synthesizer's cached frame program per chunk, so
    per-chunk work is identical to the batch path (3DMM decode -> Mosaic
    raster -> PixRefer G -> composite) with the same YUV/bf16 serving
    configuration."""

    def __init__(self, synth: Synthesizer, identity: Identity,
                 face3d_ref: np.ndarray, fg_ref: np.ndarray,
                 background: Optional[np.ndarray] = None,
                 ctx_left: int = 24, ctx_right: int = 12):
        self.synth = synth
        self.identity = identity
        self.face3d_ref = face3d_ref
        self.fg_ref = fg_ref
        s = synth.img_size
        self.background = (background if background is not None
                           else np.zeros((1, s, s, 3), np.float32))
        if self.background.ndim == 3:
            self.background = self.background[None]
        self.coeffs = StreamingCoeffPredictor(synth, chunk=synth.chunk,
                                              ctx_left=ctx_left,
                                              ctx_right=ctx_right)
        # carried idle-sway walk: exactly continues the batch driver's
        # sequence across chunks (align.head_sway_angles state form;
        # ref: infer_bfmvid.py:76-89)
        self._sway_state = (np.zeros(3, np.float64), 0.005)
        self._face3d_ref_d = jnp.asarray(face3d_ref, jnp.float32)
        self._fg_ref_d = jnp.asarray(fg_ref, jnp.float32)
        self._bg_pool = jnp.asarray(self.background, jnp.float32)
        # frames emitted so far: carries the per-frame background-pool
        # cycle (bg_idx = frame % pool) across blocks, matching the batch
        # driver's arange(T) % pool (synthesize.render_frames)
        self._frames_emitted = 0

    def _dispatch(self, exp_block) -> tuple:
        """Splice + dispatch the frame program for one coefficient block
        WITHOUT fetching: device compute of this block overlaps the host
        drain of the previous one (and the next block's coefficient
        prediction queues behind it)."""
        from voicepuppet_tpu.pipeline.align import head_sway_angles
        synth = self.synth
        emit = int(exp_block.shape[0])
        c = synth.chunk
        coeff_seq = splice_coeff_sequence(self.identity.bfmcoeff,
                                          exp_block[None])
        if emit < c:
            coeff_seq = jnp.pad(coeff_seq, ((0, c - emit), (0, 0)))
        angles, self._sway_state = head_sway_angles(
            emit, state=self._sway_state)
        ang_c = np.zeros((c, 3), np.float32)
        ang_c[:emit] = angles
        prog = synth.frame_program_for(self.identity)
        npool = self._bg_pool.shape[0]
        idx_c = np.zeros((c,), np.int32)
        idx_c[:emit] = (self._frames_emitted + np.arange(emit)) % npool
        self._frames_emitted += emit
        out, _, _ = prog(synth.g_params, coeff_seq, jnp.asarray(ang_c),
                         self._bg_pool, jnp.asarray(idx_c),
                         self._face3d_ref_d, self._fg_ref_d)
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        return out, emit

    def _pipeline(self, blocks) -> List[np.ndarray]:
        """Dispatch block k+1 before draining block k."""
        outs: List[np.ndarray] = []
        pending = None
        for b in blocks:
            cur = self._dispatch(b)
            if pending is not None:
                outs.append(self.synth.fetch_frames(*pending))
            pending = cur
        if pending is not None:
            outs.append(self.synth.fetch_frames(*pending))
        return outs

    def feed(self, pcm: np.ndarray) -> List[np.ndarray]:
        """pcm chunk in -> list of [chunk, S, S, 3] uint8 frame blocks."""
        return self._pipeline(self.coeffs.feed(pcm))

    def flush(self) -> List[np.ndarray]:
        return self._pipeline(self.coeffs.flush())
