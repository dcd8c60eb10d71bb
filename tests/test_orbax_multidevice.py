"""Orbax checkpoint round-trip on a multi-device mesh: save sharded params,
restore them with the mesh shardings (template path) and without, verify
values and shardings survive. Complements the npz round-trip in
test_checkpoint.py (reference has no trainable checkpoints; this guards the
training extension's resume path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_audio_tpu.checkpoint import load_params_orbax, save_params_orbax
from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import sam_audio_init
from sam_audio_tpu.parallel.mesh import make_mesh, shard_params

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def sharded_params():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(dp=2, tp=4)
    return shard_params(params, mesh), mesh


def test_orbax_roundtrip_sharded(tmp_path, sharded_params):
    sp, mesh = sharded_params
    path = str(tmp_path / "ckpt")
    save_params_orbax(path, sp)

    # restore with the sharded template: shardings preserved
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        sp)
    restored = load_params_orbax(path, template)
    wq = restored["transformer"]["layers"]["attention"]["wq"]["weight"]
    orig = sp["transformer"]["layers"]["attention"]["wq"]["weight"]
    assert wq.sharding == orig.sharding
    assert len({s.device for s in wq.addressable_shards}) == 8
    np.testing.assert_array_equal(np.asarray(wq), np.asarray(orig))

    # leaf set identical
    flat_a = {jax.tree_util.keystr(p) for p, _ in
              jax.tree_util.tree_flatten_with_path(sp)[0]}
    flat_b = {jax.tree_util.keystr(p) for p, _ in
              jax.tree_util.tree_flatten_with_path(restored)[0]}
    assert flat_a == flat_b


def test_orbax_restore_without_template(tmp_path, sharded_params):
    sp, _ = sharded_params
    path = str(tmp_path / "ckpt2")
    save_params_orbax(path, sp)
    restored = load_params_orbax(path)
    a = np.asarray(
        restored["transformer"]["layers"]["attention"]["wq"]["weight"])
    b = np.asarray(sp["transformer"]["layers"]["attention"]["wq"]["weight"])
    np.testing.assert_array_equal(a, b)


def test_orbax_resharding_restore(tmp_path, sharded_params):
    """Restore a checkpoint saved on (dp=2, tp=4) into a (dp=4, tp=2) mesh —
    the elastic-resume case."""
    sp, _ = sharded_params
    path = str(tmp_path / "ckpt3")
    save_params_orbax(path, sp)

    mesh2 = make_mesh(dp=4, tp=2)
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    target = shard_params(params, mesh2)
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        target)
    restored = load_params_orbax(path, template)
    wq = restored["transformer"]["layers"]["attention"]["wq"]["weight"]
    assert wq.sharding == target[
        "transformer"]["layers"]["attention"]["wq"]["weight"].sharding
    np.testing.assert_array_equal(
        np.asarray(wq),
        np.asarray(sp["transformer"]["layers"]["attention"]["wq"]["weight"]))
