import numpy as np

from hold_tpu.utils.config import DEFAULT_CONFIG, deep_merge, load_config, set_dotted
from hold_tpu.utils.databus import DataBus


def test_default_config_reference_constants():
    cfg = load_config()
    m = cfg["model"]
    assert m["implicit_network"]["dims"] == [256] * 8
    assert m["implicit_network"]["skip_in"] == [4]
    assert m["implicit_network"]["bias"] == 0.6
    assert m["ray_sampler"]["N_samples"] == 64
    assert m["ray_sampler"]["max_total_iters"] == 5
    assert m["bg_implicit_network"]["multires"] == 10
    assert cfg["dataset"]["train"]["batch_size"] == 5


def test_yaml_overlay(tmp_path):
    p = tmp_path / "o.yaml"
    p.write_text("model:\n  ray_sampler:\n    N_samples: 16\n")
    cfg = load_config(str(p))
    assert cfg["model"]["ray_sampler"]["N_samples"] == 16
    # untouched siblings survive the deep merge
    assert cfg["model"]["ray_sampler"]["N_samples_eval"] == 128
    assert DEFAULT_CONFIG["model"]["ray_sampler"]["N_samples"] == 64  # no mutation


def test_set_dotted_and_deep_merge():
    d = {"a": {"b": 1}}
    set_dotted(d, "a.c.d", 5)
    assert d["a"]["c"]["d"] == 5
    merged = deep_merge({"x": {"y": 1, "z": 2}}, {"x": {"y": 9}})
    assert merged["x"] == {"y": 9, "z": 2}


def test_databus_contract():
    import jax

    b = DataBus()
    b["k"] = 1
    try:
        b["k"] = 2
        raised = False
    except KeyError:
        raised = True
    assert raised
    b.overwrite("k", 2)
    assert b["k"] == 2
    b["node.x"] = np.ones(3)
    assert list(b.search("node.").keys()) == ["node.x"]
    assert list(b.prefix("p.").keys()) == ["p.k", "p.node.x"]
    # pytree round trip preserves keys and values
    leaves, tree = jax.tree_util.tree_flatten(b)
    back = jax.tree_util.tree_unflatten(tree, leaves)
    assert set(back.keys()) == set(b.keys())
