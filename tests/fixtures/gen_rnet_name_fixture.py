"""Generate rnet_names.json: slim resnet_v1_50 variable names + shapes.

An INDEPENDENT derivation of the Deep3DFace R-Net checkpoint's variable
inventory (the frozen FaceReconModel.pb the reference restores;
infer_bfmvid.py:46-50) — written from the published tf.slim
``resnet_v1_50`` architecture, NOT from ``pipeline/rnet.py`` (whose
``_rnet_name_rows`` this fixture cross-checks, the way tf_names.json
cross-checks tools/tf_checkpoint.py).

slim resnet_v1_50 facts encoded here (tensorflow/models research/slim
resnet_v1.py):
  * root conv: ``resnet_v1_50/conv1`` 7x7/2, 64ch, BN.
  * 4 blocks of bottleneck_v1 units: (3, 4, 6, 3) units with output
    depths (256, 512, 1024, 2048), bottleneck depth = out/4.
  * each unit scope: ``blockB/unit_U/bottleneck_v1`` with conv1 1x1,
    conv2 3x3, conv3 1x1 (conv3 un-activated), all BN'd.
  * a projection ``shortcut`` conv (1x1, BN) only on each block's FIRST
    unit (where the channel count changes).
  * every conv var is ``<scope>/weights`` (no bias — BN absorbs it);
    BN vars are ``<scope>/BatchNorm/{gamma,beta,moving_mean,
    moving_variance}``.
  * Deep3DFace head: ``resnet_v1_50/logits`` 1x1 conv to 257 with
    ``weights`` AND ``biases`` (slim conv2d with activation_fn=None,
    normalizer_fn=None keeps its bias).
"""

import json
import os

UNITS = (3, 4, 6, 3)
DEPTHS = (256, 512, 1024, 2048)
NUM_COEFF = 257


def conv_with_bn(scope, kh, kw, cin, cout):
    rows = {f"{scope}/weights": [kh, kw, cin, cout]}
    for v in ("gamma", "beta", "moving_mean", "moving_variance"):
        rows[f"{scope}/BatchNorm/{v}"] = [cout]
    return rows


def main():
    names = {}
    r = "resnet_v1_50"
    names.update(conv_with_bn(f"{r}/conv1", 7, 7, 3, 64))
    cin = 64
    for b, (units, depth) in enumerate(zip(UNITS, DEPTHS), start=1):
        bottleneck = depth // 4
        for u in range(1, units + 1):
            scope = f"{r}/block{b}/unit_{u}/bottleneck_v1"
            unit_in = cin if u == 1 else depth
            if u == 1:
                names.update(conv_with_bn(f"{scope}/shortcut", 1, 1,
                                          unit_in, depth))
            names.update(conv_with_bn(f"{scope}/conv1", 1, 1, unit_in,
                                      bottleneck))
            names.update(conv_with_bn(f"{scope}/conv2", 3, 3, bottleneck,
                                      bottleneck))
            names.update(conv_with_bn(f"{scope}/conv3", 1, 1, bottleneck,
                                      depth))
        cin = depth
    names[f"{r}/logits/weights"] = [1, 1, DEPTHS[-1], NUM_COEFF]
    names[f"{r}/logits/biases"] = [NUM_COEFF]

    out = os.path.join(os.path.dirname(__file__), "rnet_names.json")
    with open(out, "w") as f:
        json.dump(names, f, indent=1, sort_keys=True)
    print(f"wrote {len(names)} variables to {out}")


if __name__ == "__main__":
    main()
