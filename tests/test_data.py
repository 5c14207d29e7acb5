import numpy as np
import jax
import jax.numpy as jnp

from libcontinual_tpu.data.continual import build_class_map, build_stream
from libcontinual_tpu.data.source import make_synthetic
from libcontinual_tpu.data.transforms import build_transform, random_resized_crop


def test_class_map_identity_order():
    m = build_class_map(6, class_order=[0, 1, 2, 3, 4, 5])
    assert (m == np.arange(6)).all()


def test_class_map_permutation():
    # perm[new] = orig; orig_to_new[orig] = new
    m = build_class_map(4, class_order=[2, 0, 3, 1])
    assert m[2] == 0 and m[0] == 1 and m[3] == 2 and m[1] == 3


def test_stream_splits_classes_contiguously():
    cfg = dict(dataset="synthetic", task_num=3, init_cls_num=4, inc_cls_num=2,
               image_size=16, seed=0, per_class=10,
               class_order=list(range(8)))
    stream, _ = build_stream(cfg, "train")
    t0 = stream.task(0)
    assert set(np.unique(t0.labels)) == {0, 1, 2, 3}
    t2 = stream.task(2)
    assert set(np.unique(t2.labels)) == {6, 7}
    assert stream.class_range(2) == (6, 8)


def test_synthetic_is_deterministic():
    a = make_synthetic(4, 5, 16, seed=3)
    b = make_synthetic(4, 5, 16, seed=3)
    assert (a["images"] == b["images"]).all()


def test_train_pipeline_shapes_and_range():
    pipe = build_transform(None, dataset="cifar100", backbone="resnet", mode="train")
    imgs = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), np.uint8)
    out = jax.jit(pipe)(jax.random.PRNGKey(0), jnp.asarray(imgs))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_pipeline_resizes_to_224():
    pipe = build_transform(None, dataset="cifar100", backbone="vit", mode="test")
    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    out = pipe(None, jnp.asarray(imgs))
    assert out.shape == (2, 224, 224, 3)


def test_random_resized_crop_static_shape():
    imgs = jnp.ones((3, 32, 32, 3))
    out = jax.jit(lambda k, im: random_resized_crop(k, im, 24))(
        jax.random.PRNGKey(1), imgs
    )
    assert out.shape == (3, 24, 24, 3)
    # constant image stays constant under bilinear resampling
    assert np.allclose(np.asarray(out), 1.0, atol=1e-5)


def test_yaml_trfms_spec():
    spec = [
        {"RandomCrop": {"size": 32, "padding": 4}},
        {"RandomHorizontalFlip": {}},
        {"ToTensor": {}},
        {"Normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]}},
    ]
    pipe = build_transform(spec)
    imgs = np.full((2, 32, 32, 3), 128, np.uint8)
    out = jax.jit(pipe)(jax.random.PRNGKey(0), jnp.asarray(imgs))
    assert out.shape == (2, 32, 32, 3)
