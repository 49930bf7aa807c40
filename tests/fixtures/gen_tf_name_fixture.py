"""Generate the reference TF-checkpoint variable name/shape fixture.

INDEPENDENT derivation: this script re-states the reference graph
structure straight from the reference sources — scope rules and channel
schedules hand-read from voicepuppet/bfmnet/tinynet.py:12-216,
bfmnet.py:185-213 and voicepuppet/pixrefer/pixrefer.py:59-330 — WITHOUT
importing voicepuppet_tpu.tools.tf_checkpoint.  tests/test_tf_fixture.py
then cross-checks the converter's mapping against this fixture; the two
derivations disagreeing means one of them misread the reference (this
process already caught the converter's depthwise naming bug:
tf.contrib.layers.separable_conv2d uses 'SeparableConv2d/depthwise_weights',
not tf.layers' 'separable_conv2d/depthwise_kernel').

Scope rules used (TF1 semantics):
  * tf.layers.conv2d/conv2d_transpose/dense with name=None open a default
    'conv2d'/'conv2d_transpose'/'dense' scope, uniquified per enclosing
    variable scope ('dense', 'dense_1', ...).
  * tf.contrib.layers.batch_norm -> 'BatchNorm/{beta,moving_mean,
    moving_variance}' (scale=False: no gamma); tf.layers.
    batch_normalization -> 'batch_normalization/{gamma,beta,moving_*}'.
  * tf.contrib.layers.separable_conv2d -> 'SeparableConv2d/
    depthwise_weights' [H, W, C, mult=1].
  * tf.contrib.rnn.GRUCell under MultiRNNCell+dynamic_rnn ->
    'rnn/multi_rnn_cell/cell_0/gru_cell/{gates,candidate}/{kernel,bias}'.

Run:  python tests/fixtures/gen_tf_name_fixture.py
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "tf_names.json")


def bfmnet_names():
    """BFMNet at reference widths (tinynet.py:169-207, bfmnet.py:194-213):
    thinresnet_output_channels=256, encode_embedding_size=256,
    rnn_hidden_size=256, mel input 1 channel."""
    names = {}

    def contrib_bn(scope, ch):
        names[f"{scope}/BatchNorm/beta"] = [ch]
        names[f"{scope}/BatchNorm/moving_mean"] = [ch]
        names[f"{scope}/BatchNorm/moving_variance"] = [ch]

    def conv_block(scope, kh, kw, cin, cout):
        # tinynet.py:12-27: variable_scope(scope) > variable_scope('conv2d')
        # > tf.layers.conv2d (opens its own 'conv2d', use_bias=False) + BN
        names[f"{scope}/conv2d/conv2d/kernel"] = [kh, kw, cin, cout]
        contrib_bn(f"{scope}/conv2d", cout)

    def ir_block(scope, cin, cout, expansion):
        # tinynet.py:46-142
        ce = cin * expansion
        names[f"{scope}/expansion_1x1_conv2d/conv2d/kernel"] = [1, 1, cin,
                                                                ce]
        contrib_bn(f"{scope}/expansion_1x1_conv2d", ce)
        names[f"{scope}/depthwise_conv2d/SeparableConv2d/"
              "depthwise_weights"] = [7, 3, ce, 1]
        contrib_bn(f"{scope}/depthwise_conv2d", ce)
        names[f"{scope}/projection_1x1_conv2d/conv2d/kernel"] = [1, 1, ce,
                                                                 cout]
        contrib_bn(f"{scope}/projection_1x1_conv2d", cout)
        if cin != cout:  # residual 1x1 shortcut (tinynet.py:136-138)
            names[f"{scope}/1x1_conv2d/conv2d/kernel"] = [1, 1, cin, cout]
            contrib_bn(f"{scope}/1x1_conv2d", cout)

    m = "mfcc_encoder/MfccNet"
    conv_block(f"{m}/block0_0", 9, 5, 1, 32)
    # (scope, cin, cout, expansion); MfccNet schedule tinynet.py:169-207
    schedule = [
        ("block1_0", 32, 64, 1),
        ("block2_0", 64, 64, 6), ("block2_1", 64, 64, 6),
        ("block3_0", 64, 128, 6), ("block3_1", 128, 128, 6),
        ("block3_2", 128, 128, 6),
        ("block4_0", 128, 192, 6), ("block4_1", 192, 192, 6),
        ("block4_2", 192, 192, 6), ("block4_3", 192, 192, 6),
        ("block5_0", 192, 256, 6), ("block5_1", 256, 256, 6),
        ("block5_2", 256, 256, 6),
        ("block6_0", 256, 256, 6), ("block6_1", 256, 256, 6),
        ("block6_2", 256, 256, 6),
        ("block7_0", 256, 256, 6),
    ]
    for scope, cin, cout, exp in schedule:
        ir_block(f"{m}/{scope}", cin, cout, exp)
    conv_block(f"{m}/block8_0", 1, 1, 256, 256)

    # bfmnet.py:194-200: dense after the backbone in 'mfcc_encoder'
    names["mfcc_encoder/dense/kernel"] = [256, 256]
    names["mfcc_encoder/dense/bias"] = [256]
    # bfmnet.py:203-206: 'rnn_module' dense + GRU(256) on 256-dim input
    names["rnn_module/dense/kernel"] = [256, 256]
    names["rnn_module/dense/bias"] = [256]
    g = "rnn_module/rnn/multi_rnn_cell/cell_0/gru_cell"
    names[f"{g}/gates/kernel"] = [512, 512]      # [in+h, 2h]
    names[f"{g}/gates/bias"] = [512]
    names[f"{g}/candidate/kernel"] = [512, 256]  # [in+h, h]
    names[f"{g}/candidate/bias"] = [256]
    # bfmnet.py:111-117: decoder dense 128 -> 64 -> 64
    names["bfm_coeff_decoder/dense/kernel"] = [256, 128]
    names["bfm_coeff_decoder/dense/bias"] = [128]
    names["bfm_coeff_decoder/dense_1/kernel"] = [128, 64]
    names["bfm_coeff_decoder/dense_1/bias"] = [64]
    names["bfm_coeff_decoder/dense_2/kernel"] = [64, 64]
    names["bfm_coeff_decoder/dense_2/bias"] = [64]
    return names


def pixrefer_names():
    """PixRefer generator+discriminator at ngf=ndf=64
    (pixrefer.py:59-134, 166-330).  tf.layers BN carries
    gamma/beta/moving_mean/moving_variance; the moving stats are dead in
    the reference (training=True always) — listed here under 'dropped'."""
    names = {}
    dropped = {}

    def layers_bn(scope, ch):
        names[f"{scope}/batch_normalization/gamma"] = [ch]
        names[f"{scope}/batch_normalization/beta"] = [ch]
        dropped[f"{scope}/batch_normalization/moving_mean"] = [ch]
        dropped[f"{scope}/batch_normalization/moving_variance"] = [ch]

    def conv(scope, cin, cout):
        names[f"{scope}/conv2d/kernel"] = [4, 4, cin, cout]
        names[f"{scope}/conv2d/bias"] = [cout]

    def deconv(scope, cin, cout):
        # tf conv2d_transpose kernel layout [H, W, out, in]
        names[f"{scope}/conv2d_transpose/kernel"] = [4, 4, cout, cin]
        names[f"{scope}/conv2d_transpose/bias"] = [cout]

    ngf = 64
    g = "generator"
    # face-render encoder: inputs 6ch (pixrefer.py:168-190)
    conv(f"{g}/encoder_1", 6, ngf)
    enc = [(ngf, ngf * 2), (ngf * 2, ngf * 2), (ngf * 2, ngf * 4)]
    for i, (cin, cout) in enumerate(enc, start=2):
        conv(f"{g}/encoder_{i}", cin, cout)
        layers_bn(f"{g}/encoder_{i}", cout)
    # fg encoder: 3ch (pixrefer.py:192-206, 281)
    conv(f"{g}/encoder_fg_1", 3, ngf)
    for i, (cin, cout) in enumerate(enc, start=2):
        conv(f"{g}/encoder_fg_{i}", cin, cout)
        layers_bn(f"{g}/encoder_fg_{i}", cout)
    # merged trunk: concat 256+256 (pixrefer.py:208-224)
    merged = [(ngf * 8, ngf * 4), (ngf * 4, ngf * 8), (ngf * 8, ngf * 8),
              (ngf * 8, ngf * 8)]
    for i, (cin, cout) in enumerate(merged, start=2):
        conv(f"{g}/merged_encoder_{i}", cin, cout)
        layers_bn(f"{g}/merged_encoder_{i}", cout)
    # merged decoder, creation order 5,4,3,2 (pixrefer.py:226-248)
    md = [("merged_decoder_5", ngf * 8, ngf * 8),
          ("merged_decoder_4", ngf * 16, ngf * 8),
          ("merged_decoder_3", ngf * 16, ngf * 4),
          ("merged_decoder_2", ngf * 8, ngf * 4)]
    for scope, cin, cout in md:
        deconv(f"{g}/{scope}", cin, cout)
        layers_bn(f"{g}/{scope}", cout)
    # second decoder vs the face encoder, order 4,3,2 (pixrefer.py:250-267)
    m2 = [("merged2_decoder_4", ngf * 8, ngf * 2),
          ("merged2_decoder_3", ngf * 4, ngf * 2),
          ("merged2_decoder_2", ngf * 4, ngf)]
    for scope, cin, cout in m2:
        deconv(f"{g}/{scope}", cin, cout)
        layers_bn(f"{g}/{scope}", cout)
    deconv(f"{g}/decoder_1", ngf * 2, 4)  # RGBA head (pixrefer.py:269-275)

    # discriminator: 3+3 ch input (pixrefer.py:103-134, 295-306)
    ndf = 64
    d = "discriminator"
    conv(f"{d}/layer_1", 6, ndf)
    dl = [(ndf, ndf * 2, 2), (ndf * 2, ndf * 4, 3), (ndf * 4, ndf * 8, 4)]
    for cin, cout, i in dl:
        conv(f"{d}/layer_{i}", cin, cout)
        layers_bn(f"{d}/layer_{i}", cout)
    conv(f"{d}/layer_5", ndf * 8, 1)
    return names, dropped


def main():
    bfm = bfmnet_names()
    px, px_dropped = pixrefer_names()
    blob = {
        "bfmnet": bfm,
        "pixrefer": px,
        "pixrefer_dropped_moving_stats": px_dropped,
    }
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}: bfmnet {len(bfm)} vars, "
          f"pixrefer {len(px)} mapped + {len(px_dropped)} dropped")


if __name__ == "__main__":
    main()
