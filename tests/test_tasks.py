import jax
import jax.numpy as jnp
import numpy as np

from unirestore_tpu.tasks import deeplab as DLB
from unirestore_tpu.tasks import refinenet as RF
from unirestore_tpu.tasks import resnet as RN
from unirestore_tpu.tasks import rvt as RVT


def test_resnet50_shapes_and_loss():
    p = RN.resnet_init(jax.random.PRNGKey(0), "resnet50", num_classes=10)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits = RN.resnet_apply(p, x)
    assert logits.shape == (2, 10)
    loss = RN.cross_entropy_loss(logits, jnp.array([1, 2]))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda img: RN.cross_entropy_loss(
        RN.resnet_apply(p, img), jnp.array([1, 2])))(x)
    assert float(jnp.abs(g).sum()) > 0  # differentiable critic


def test_resnet_output_stride_dilation():
    p = RN.resnet_init(jax.random.PRNGKey(0), "resnet50")
    x = jnp.ones((1, 64, 64, 3))
    f32 = RN.resnet_features(p, x)
    f16 = RN.resnet_features(p, x, output_stride=16)
    assert f32["c5"].shape[1] == 2  # /32
    assert f16["c5"].shape[1] == 4  # /16 (dilated)


def test_deeplab_logits_at_input_res():
    p = DLB.deeplabv3plus_init(jax.random.PRNGKey(0), num_classes=19)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 3))
    logits = DLB.deeplabv3plus_apply(p, x)
    assert logits.shape == (1, 64, 96, 19)
    labels = jnp.zeros((1, 64, 96), jnp.int32).at[0, 0, 0].set(255)
    loss = DLB.seg_cross_entropy_loss(logits, labels)
    assert np.isfinite(float(loss))


def test_seg_ce_ignores_255():
    logits = jnp.zeros((1, 2, 2, 3))
    all_ignore = jnp.full((1, 2, 2), 255, jnp.int32)
    assert float(DLB.seg_cross_entropy_loss(logits, all_ignore)) == 0.0


def test_refinenet_shapes():
    p = RF.refinenet_lw_init(jax.random.PRNGKey(0), num_classes=19,
                             backbone="resnet50")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    logits = RF.refinenet_lw_apply(p, x)
    assert logits.shape == (1, 64, 64, 19)


def test_rvt_base_plus():
    p = RVT.rvt_base_plus_init(jax.random.PRNGKey(0), num_classes=7)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    logits = RVT.rvt_base_plus_apply(p, x)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()
