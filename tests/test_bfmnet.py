"""BFMNet architecture shape/range tests (the reference's test pattern,
voicepuppet/atvgnet/test_atnet.py:16-113, applied to the model the reference
never tested) plus loss-equivalence golden tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.models import bfmnet as bfmnet_mod
from voicepuppet_tpu.models.layers import MfccNet, l2_regularization


B, T = 2, 6


@pytest.fixture(scope="module")
def cfg():
    return Config()


@pytest.fixture(scope="module")
def built(cfg):
    model = bfmnet_mod.BFMNet(cfg.bfmnet)
    rng = jax.random.PRNGKey(0)
    ears = jnp.zeros((B, T, 1), jnp.float32)
    mfccs = jnp.asarray(np.random.RandomState(0).randn(B, T * 5, 80),
                        jnp.float32)
    seq_len = jnp.asarray([T, T - 2], jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, ears, mfccs,
                           seq_len, train=True)
    return model, variables, (ears, mfccs, seq_len)


def test_forward_shapes(built, cfg):
    model, variables, (ears, mfccs, seq_len) = built
    out, _ = model.apply(variables, ears, mfccs, seq_len, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    assert out.shape == (B, T, cfg.bfmnet.bfm_coeff_size)
    assert np.isfinite(np.asarray(out)).all()


def test_eval_deterministic(built):
    model, variables, (ears, mfccs, seq_len) = built
    a = model.apply(variables, ears, mfccs, seq_len, train=False)
    b = model.apply(variables, ears, mfccs, seq_len, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mfccnet_downsamples_freq_not_time():
    net = MfccNet(output_channels=256)
    x = jnp.zeros((1, 30, 80, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(variables, x, train=False)
    # freq 80 -> 40 (stem) -> 20 -> 10 -> 5 -> 3 (four 'same' maxpools);
    # time preserved (ref: tinynet.py:169-207)
    assert y.shape == (1, 30, 3, 256)


def test_ear_injection_hits_dims_16_20(built):
    model, variables, (ears, mfccs, seq_len) = built
    base = model.apply(variables, ears, mfccs, seq_len, train=False)
    bumped = model.apply(variables, ears + 1.0, mfccs, seq_len, train=False)
    delta = np.abs(np.asarray(bumped) - np.asarray(base)).max(axis=(0, 1))
    # only dims [16, 20) move, by exactly |[-2,-2,-2,-4]|
    assert delta[:16].max() == 0
    assert delta[20:].max() == 0
    np.testing.assert_allclose(delta[16:20], [2, 2, 2, 4], atol=1e-5)


def test_loss_matches_full_vertex_space_reference(cfg):
    """The folded einsum loss must equal the reference formulation that
    materializes full [B,T,3N] vertex tensors (bfmnet.py:241-267)."""
    model = bfm_mod.synthetic_bfm(num_theta=12, num_phi=12, seed=2)
    n = model.num_vertices
    rng = np.random.RandomState(3)
    mouth_idx = rng.choice(n, size=n // 10, replace=False)
    mouth_mask = bfmnet_mod.make_mouth_mask(n, mouth_idx)

    pred = rng.randn(B, T, 64).astype(np.float32)
    true = rng.randn(B, T, 257).astype(np.float32)
    seq_len = np.array([T, T - 2], np.int32)

    got = float(bfmnet_mod.BFMNetLoss(model.exBase, mouth_mask)(
        jnp.asarray(pred), jnp.asarray(true), jnp.asarray(seq_len)))

    # reference formulation in float64: decode id+exp through the bases,
    # recenter, mouth-weight, L1 + temporal L1 with sequence masks
    ex64 = model.exBase.astype(np.float64)
    id64 = model.idBase.astype(np.float64)
    mean64 = model.meanshape.reshape(-1).astype(np.float64)
    recenter = np.tile(model.meanshape.reshape(-1, 3).mean(0), (n, 1)
                       ).reshape(-1)

    def decode(idc, exc):
        return id64 @ idc + ex64 @ exc + mean64 - recenter

    shp_pred = np.zeros((B, T, 3 * n))
    shp_true = np.zeros((B, T, 3 * n))
    for b in range(B):
        for t in range(T):
            shp_pred[b, t] = decode(true[b, t, :80], pred[b, t])
            shp_true[b, t] = decode(true[b, t, :80], true[b, t, 80:144])
    vmask = mouth_mask.reshape(-1).astype(np.float64)
    frame = np.sum(np.abs(shp_true - shp_pred) * vmask, axis=-1)
    smask = (np.arange(T)[None, :] < seq_len[:, None])
    want = np.mean(np.sum(frame * smask, axis=-1))
    vid = ((shp_pred[:, 1:] - shp_pred[:, :-1])
           - (shp_true[:, 1:] - shp_true[:, :-1]))
    vid = np.sum(np.abs(vid) * vmask, axis=-1)
    vmask_t = (np.arange(T - 1)[None, :] < (seq_len - 1)[:, None])
    want += np.mean(np.sum(vid * vmask_t, axis=-1))

    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_l2_regularization_counts_conv_kernels():
    net = MfccNet(output_channels=64)
    x = jnp.zeros((1, 10, 80, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    reg = float(l2_regularization(variables["params"], scale=1e-4))
    assert reg > 0
    # doubling every kernel quadruples the loss
    doubled = jax.tree_util.tree_map(lambda w: w * 2, variables["params"])
    reg2 = float(l2_regularization(doubled, scale=1e-4))
    np.testing.assert_allclose(reg2, 4 * reg, rtol=1e-5)


def test_masked_gru_zeroes_past_seq_len():
    """tf.nn.dynamic_rnn semantics: outputs past each row's sequence_length
    are exactly zero (ref: bfmnet.py:58-61)."""
    from voicepuppet_tpu.models.layers import masked_gru
    gru = masked_gru(num_units=16, num_layers=1, drop_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 4), jnp.float32)
    seq = jnp.asarray([8, 5], jnp.int32)
    variables = gru.init(jax.random.PRNGKey(0), x, seq, train=False)
    out = np.asarray(gru.apply(variables, x, seq, train=False))
    assert np.abs(out[1, 5:]).max() == 0.0
    assert np.abs(out[1, :5]).max() > 0.0
    assert np.abs(out[0]).max() > 0.0


def test_mask_time_bucket_padding_matches_exact_length(cfg):
    """mask_time=True: running the model at a padded (bucketed) length
    equals the exact-length run for frames < seq_len — every CNN stage
    re-zeroes padded time rows, reproducing 'SAME' zero padding at the
    true boundary (the serving path that avoids per-duration XLA
    recompiles; round-2 VERDICT weak #4).  Padded mel rows are filled
    with random garbage to prove the mask, not the pad values, carries
    the equivalence."""
    import dataclasses
    cfg2 = dataclasses.replace(
        cfg, bfmnet=dataclasses.replace(cfg.bfmnet,
                                        backbone_width_mult=0.25,
                                        thinresnet_output_channels=64,
                                        encode_embedding_size=64,
                                        rnn_hidden_size=64))
    model = bfmnet_mod.BFMNet(cfg2.bfmnet)
    rng = jax.random.PRNGKey(1)
    t, tb = 7, 16
    rs = np.random.RandomState(3)
    mfcc = rs.randn(1, t * 5, 80).astype(np.float32)
    ears = rs.rand(1, t, 1).astype(np.float32) / 100.0
    seq = jnp.asarray([t], jnp.int32)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.asarray(ears), jnp.asarray(mfcc), seq,
                           train=False)
    exact = model.apply(variables, jnp.asarray(ears), jnp.asarray(mfcc),
                        seq, train=False)

    mfcc_pad = rs.randn(1, tb * 5, 80).astype(np.float32) * 50.0
    mfcc_pad[:, :t * 5] = mfcc
    ears_pad = np.zeros((1, tb, 1), np.float32)
    ears_pad[:, :t] = ears
    padded = model.apply(variables, jnp.asarray(ears_pad),
                         jnp.asarray(mfcc_pad), seq, train=False,
                         mask_time=True)
    np.testing.assert_allclose(np.asarray(padded[:, :t]),
                               np.asarray(exact), rtol=0, atol=1e-6)
    # without the mask the garbage rows bleed into the tail frames —
    # the control that proves the test can fail
    unmasked = model.apply(variables, jnp.asarray(ears_pad),
                           jnp.asarray(mfcc_pad), seq, train=False)
    assert np.abs(np.asarray(unmasked[:, :t])
                  - np.asarray(exact)).max() > 1e-4


def test_bfloat16_trunk_close_to_f32(cfg):
    """BFMNet(dtype=bfloat16): the conv trunk runs in bf16 (params f32,
    BN moments f32, GRU+head f32) and the coefficients stay within a
    loosened tolerance of the exact f32 path — the serving-speed knob
    (Synthesizer bfmnet_dtype; PERF.md backlog #2)."""
    import dataclasses
    cfg2 = dataclasses.replace(
        cfg, bfmnet=dataclasses.replace(cfg.bfmnet,
                                        backbone_width_mult=0.25,
                                        thinresnet_output_channels=64,
                                        encode_embedding_size=64,
                                        rnn_hidden_size=64))
    m32 = bfmnet_mod.BFMNet(cfg2.bfmnet)
    m16 = bfmnet_mod.BFMNet(cfg2.bfmnet, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    t = 8
    rs = np.random.RandomState(0)
    ears = jnp.asarray(rs.rand(2, t, 1) / 100.0, jnp.float32)
    mfcc = jnp.asarray(rs.randn(2, t * 5, 80), jnp.float32)
    seq = jnp.full((2,), t, jnp.int32)
    variables = m32.init({"params": rng, "dropout": rng}, ears, mfcc, seq,
                         train=False)
    o32 = np.asarray(m32.apply(variables, ears, mfcc, seq, train=False))
    o16 = np.asarray(m16.apply(variables, ears, mfcc, seq, train=False))
    assert o16.dtype == np.float32  # head casts back
    scale = np.abs(o32).max()
    assert np.abs(o32 - o16).max() < 0.05 * scale + 1e-3, (
        np.abs(o32 - o16).max(), scale)
    # the bf16 path must actually differ (proves the cast is live)
    assert np.abs(o32 - o16).max() > 0.0
