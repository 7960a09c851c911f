"""VGG-16 classifier probe (torchvision ``vgg16``), NHWC.

Used by the reference's classification "all" eval set
(eval_classification.py:262 ``vgg16(weights="IMAGENET1K_V1")``) and as an
``_ft`` fine-tuned probe in "all_ft". Functional init/apply pair in the same
style as tasks/resnet.py; weights come from tools/convert_torchvision.py.

Inputs: NHWC in [0, 1]; resized to 224^2 + ImageNet-normalized inside
``preprocess`` (the reference normalizes all classifier inputs the same way,
eval_classification.py:210-215).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from . import resnet as RN

# torchvision vgg16 "D" configuration: conv channel plan between maxpools.
VGG16_PLAN = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
              (512, 512, 512))


def max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        padding="VALID")


def vgg16_init(key, num_classes: int = 1000):
    keys = iter(jax.random.split(key, 32))
    cin = 3
    stages = []
    for plan in VGG16_PLAN:
        stage = []
        for cout in plan:
            stage.append(L.conv2d_init(next(keys), cin, cout, 3))
            cin = cout
        stages.append(stage)
    return {
        "features": stages,
        "fc1": L.linear_init(next(keys), 512 * 7 * 7, 4096),
        "fc2": L.linear_init(next(keys), 4096, 4096),
        "fc3": L.linear_init(next(keys), 4096, num_classes),
    }


def vgg16_features(p, x):
    h = x
    for stage in p["features"]:
        for conv in stage:
            h = jax.nn.relu(L.conv2d(conv, h, padding=1))
        h = max_pool_2x2(h)
    return h


def vgg16_apply(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> logits (B, num_classes). Internally resizes to 224^2."""
    x = RN.preprocess(images) if preprocess_input else images
    h = vgg16_features(p, x)  # (B, 7, 7, 512)
    # torch flattens NCHW => channel-major; transpose before flatten so the
    # converted fc1 weights line up.
    b = h.shape[0]
    flat = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)
    h = jax.nn.relu(L.linear(p["fc1"], flat))
    h = jax.nn.relu(L.linear(p["fc2"], h))
    return L.linear(p["fc3"], h)
