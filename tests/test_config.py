"""Config-system tests (mirrors base/tests/config_parsing.cu)."""

import json

import pytest

import amgx_tpu as amgx
from amgx_tpu.config import AMGConfig, AMGXConfigError


def test_string_parsing_basic():
    cfg = AMGConfig("solver=PCG, max_iters=42; tolerance=1e-6")
    assert cfg.get("solver") == "PCG"
    assert cfg.get("max_iters") == 42
    assert cfg.get("tolerance") == 1e-6


def test_string_scope_prefix():
    cfg = AMGConfig("solver=PCG, amg:max_iters=7")
    assert cfg.get("max_iters", "amg") == 7
    # fallback to default scope
    assert cfg.get("tolerance", "amg") == cfg.get("tolerance")


def test_solver_scope_declaration():
    cfg = AMGConfig("solver(amg_scope)=AMG, amg_scope:max_iters=3")
    name, child = cfg.get_pair("solver")
    assert name == "AMG"
    assert child == "amg_scope"
    assert cfg.get("max_iters", child) == 3


def test_json_nested_scopes():
    cfg = AMGConfig({
        "config_version": 2,
        "solver": {
            "solver": "FGMRES",
            "max_iters": 100,
            "preconditioner": {
                "solver": "AMG",
                "scope": "amg",
                "max_iters": 1,
                "smoother": "BLOCK_JACOBI",
            },
            "scope": "main",
        },
    })
    name, main_scope = cfg.get_pair("solver")
    assert name == "FGMRES" and main_scope == "main"
    name, child = cfg.get_pair("preconditioner", main_scope)
    assert name == "AMG" and child == "amg"
    assert cfg.get("max_iters", "amg") == 1
    assert cfg.get("max_iters", main_scope) == 100
    assert cfg.get("smoother", "amg") == "BLOCK_JACOBI"


def test_unknown_parameter_rejected():
    with pytest.raises(AMGXConfigError):
        AMGConfig("no_such_param=1")


def test_value_validation():
    with pytest.raises(AMGXConfigError):
        AMGConfig("strength_threshold=2.5")      # outside [0, 1]
    with pytest.raises(AMGXConfigError):
        AMGConfig("convergence=NOT_A_CRITERION")


def test_type_coercion():
    cfg = AMGConfig("max_iters=10.0, monitor_residual=1")
    assert cfg.get("max_iters") == 10
    assert isinstance(cfg.get("max_iters"), int)


def test_write_parameters_description():
    out = amgx.write_parameters_description("json")
    d = json.loads(out)
    assert "max_iters" in d and "tolerance" in d
    assert d["max_iters"]["type"] == "int"


def test_config_file_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"config_version": 2,
                             "solver": {"solver": "PCG", "max_iters": 5,
                                        "scope": "main"}}))
    cfg = AMGConfig()
    cfg.parse_file(str(p))
    name, scope = cfg.get_pair("solver")
    assert name == "PCG"
    assert cfg.get("max_iters", scope) == 5


def test_clone_independent():
    cfg = AMGConfig("max_iters=3")
    c2 = cfg.clone()
    c2.set("max_iters", 9)
    assert cfg.get("max_iters") == 3
    assert c2.get("max_iters") == 9
