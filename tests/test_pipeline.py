"""StreamingDetector on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.pipeline import StreamingDetector
from test_model import TINY


@pytest.fixture(scope="module")
def streaming():
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    return StreamingDetector(
        model_name=TINY,
        image_size=64,
        batch_size=4,
        variables=variables,
        confidence_threshold=1e-6,
        post_nms_max=10,
        dtype=jnp.float32,
    )


def test_streaming_yields_per_image_results(streaming):
    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, (rng.randint(40, 90), rng.randint(40, 90), 3), np.uint8)
        for _ in range(10)
    ]
    results = list(streaming.run(images))
    assert len(results) == 10
    for r in results:
        assert r["boxes_xyxy"].shape == (10, 4)
        assert r["scores"].shape == (10,)
        assert r["valid"].shape == (10,)
        # packed meshes: one [V, 3] device array per VALID detection slot
        assert isinstance(r["vertices"], dict)
        n_valid = int(r["valid"].sum())
        assert len(r["vertices"]) == min(n_valid, streaming.decode_budget)
        for slot, v in r["vertices"].items():
            assert r["valid"][slot]
            assert v.ndim == 2 and v.shape[1] == 3
        assert 0 < r["scale"] <= 1.6


def test_streaming_batch_sharded_over_mesh(streaming):
    # the mesh axis must divide the batch; with 8 virtual devices and batch 4
    # the constructor picks the largest divisor (4)
    assert streaming.mesh.devices.size in (1, 2, 4)
