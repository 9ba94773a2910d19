"""Multi-chip SPMD paths on the 8-device virtual CPU mesh: dryrun of the
full sharded training step (DP x TP), and the sharding rules themselves."""
import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from video_caption_tpu.config import MeshConfig
from video_caption_tpu.parallel import mesh as pmesh


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_make_mesh_shape():
    mesh = pmesh.make_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_mesh_wrong_count_raises():
    with pytest.raises(ValueError):
        pmesh.make_mesh(MeshConfig(data=3, model=2))


def test_param_specs_tp_rules(tiny_params):
    specs = pmesh.param_specs(tiny_params, model_size=2)
    blocks = specs["decoder"]["blocks"]
    assert blocks["attn_w"][-1] == "model"     # column parallel out dim
    assert blocks["proj_w"][-2] == "model"     # row parallel in dim
    assert specs["decoder"]["lnf_scale"] == pmesh.P(None)


def test_shard_batch_places_on_data_axis(tiny_params):
    mesh = pmesh.make_mesh(MeshConfig(data=8, model=1))
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = pmesh.shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec[0] == "data"
