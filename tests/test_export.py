"""Export: QARepVGG fusion equivalence + serialized StableHLO round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.export import (
    export_serialized,
    fuse_qarepvgg,
    load_serialized,
)
from head_detector_tpu.models import build_model, init_model
from test_model import TINY


@pytest.fixture(scope="module")
def trained():
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    return model, variables


def test_fused_deploy_matches_training_model(trained):
    model, variables = trained
    deploy_model = build_model(TINY, deploy=True, dtype=jnp.float32)
    fused = fuse_qarepvgg(variables, TINY)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    ref_dec, _ = model.apply(variables, x, train=False)
    dep_dec, _ = deploy_model.apply(fused, x, train=False)

    # the fused graph is algebraically identical; only float reassociation
    # differs, so outputs agree to float32 roundoff amplified by depth
    np.testing.assert_allclose(
        np.asarray(dep_dec.scores), np.asarray(ref_dec.scores), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(dep_dec.boxes_xyxy), np.asarray(ref_dec.boxes_xyxy),
        rtol=1e-2, atol=0.5,
    )
    # score-ranking must be preserved (what NMS actually consumes)
    ref_rank = np.argsort(np.asarray(ref_dec.scores[0, :, 0]))[-5:]
    dep_rank = np.argsort(np.asarray(dep_dec.scores[0, :, 0]))[-5:]
    assert set(ref_rank) == set(dep_rank)


def test_fused_param_count_is_smaller(trained):
    model, variables = trained
    fused = fuse_qarepvgg(variables, TINY)
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    n_deploy = sum(x.size for x in jax.tree_util.tree_leaves(fused["params"]))
    assert n_deploy < n_train


def test_serialized_export_roundtrip(trained, tmp_path):
    model, variables = trained

    def fn(images):
        decoded, _ = model.apply(variables, images, train=False)
        return decoded.boxes_xyxy, decoded.scores

    example = jnp.zeros((1, 64, 64, 3), jnp.float32)
    path = str(tmp_path / "model.shlo")
    export_serialized(fn, (example,), path)

    restored = load_serialized(path)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    boxes_a, scores_a = fn(x)
    boxes_b, scores_b = restored(x)
    # the deserialized StableHLO recompiles through a slightly different
    # pipeline; agreement is float32-roundoff level, not bitwise
    np.testing.assert_allclose(np.asarray(boxes_a), np.asarray(boxes_b), atol=5e-2)
    np.testing.assert_allclose(np.asarray(scores_a), np.asarray(scores_b), atol=1e-3)
