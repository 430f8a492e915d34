"""CLI smoke tests (fast paths: parsing + convert round-trip)."""

import jax
import numpy as np
import pytest

from musketeer_tpu import cli
from musketeer_tpu.models import ofa
from musketeer_tpu.training.checkpoint import export_pt, import_pt
from tests.test_model import tiny_cfg


def test_parser_rejects_missing_cmd():
    with pytest.raises(SystemExit):
        cli.main([])


def test_convert_cmd(tmp_path):
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    pt_path = str(tmp_path / "model.pt")
    export_pt(params, cfg, pt_path)
    # import back and check a leaf survives the torch round-trip
    params2, cfg2 = import_pt(pt_path, cfg)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["pos_ln"]["scale"]),
        params2["encoder"]["pos_ln"]["scale"],
        rtol=1e-6,
    )
    cli.main(["convert", "--pt", pt_path, "--out", str(tmp_path / "converted")])
    assert (tmp_path / "converted").exists()
