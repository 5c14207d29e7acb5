import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.registry import BACKBONES
import libcontinual_tpu.models  # noqa: F401


def test_vit_ssf_and_vpt_variants():
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    for kwargs in ({"ssf": True}, {"vpt_len": 3}):
        m = BACKBONES.get("vit_tiny_test")(**kwargs)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out["features"].shape == (2, 64)
        if "vpt_len" in kwargs:
            assert "vpt_prompts" in v["params"]
        else:
            assert "ssf_1" in v["params"]["block_0"]


def test_moe_block_aux():
    from libcontinual_tpu.models.vit import VisionTransformer

    m = VisionTransformer(img_size=32, patch_size=8, embed_dim=64, depth=2,
                          num_heads=4, moe_experts=2, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert "moe_aux" in out and np.isfinite(float(out["moe_aux"]))
