"""Core infrastructure: config loader, registry, mesh param specs, and the
v1 (vicuna TWO-style) preprocessing path."""

import numpy as np
import pytest

from gpt4roi_tpu.core.config import Config, load_config
from gpt4roi_tpu.core.registry import Registry


def test_config_python_file(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("lr = 3e-4\nspi_datasets = [{'type': 'RefCOCO', 'ratio': 0.5}]\nnested = {'a': {'b': 1}}\n")
    cfg = load_config(str(p))
    assert cfg.lr == 3e-4
    assert cfg.spi_datasets[0].type == "RefCOCO"
    assert cfg.nested.a.b == 1
    d = cfg.to_dict()
    assert isinstance(d["nested"], dict) and not isinstance(d["nested"], Config)


def test_config_json_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"x": 1, "y": {"z": 2}}')
    cfg = load_config(str(p))
    assert cfg.x == 1 and cfg.y.z == 2


def test_registry():
    reg = Registry("things")

    @reg.register()
    class Foo:
        def __init__(self, a=1):
            self.a = a

    assert "Foo" in reg
    obj = reg.build({"type": "Foo", "a": 5})
    assert obj.a == 5
    with pytest.raises(KeyError):
        reg.get("Bar")
    with pytest.raises(KeyError):
        reg.register("Foo")(Foo)


def test_fsdp_param_spec():
    import jax
    from jax.sharding import PartitionSpec as P

    from gpt4roi_tpu.core.mesh import fsdp_param_spec, make_mesh

    mesh = make_mesh(jax.devices()[:8])
    # big divisible param shards the largest divisible axis
    assert fsdp_param_spec("w", (1024, 512), mesh, min_size=16) == P("data", None)
    # small param stays replicated
    assert fsdp_param_spec("b", (7,), mesh, min_size=1024) == P()
    # indivisible axes fall back to replication
    assert fsdp_param_spec("w", (7, 9), mesh, min_size=1) == P()


def test_preprocess_v1_two_style():
    from gpt4roi_tpu.data import conversation as conv_lib
    from gpt4roi_tpu.data.constants import IGNORE_INDEX
    from gpt4roi_tpu.data.tokenization import preprocess_v1
    from tests.toy_tokenizer import ToyTokenizer

    tok = ToyTokenizer(model_max_length=512, add_bos=True)
    src = [
        {"from": "human", "value": "what is this"},
        {"from": "gpt", "value": "an apple"},
    ]
    out = preprocess_v1([src], tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids.shape == labels.shape
    # answer tokens survive masking
    apple = tok.vocab["apple"]
    pos = np.where(ids == apple)[0]
    assert len(pos) == 1 and labels[pos[0]] == apple
    # the system prompt + question region is masked
    assert labels[0] == IGNORE_INDEX
    q = tok.vocab["what"]
    qpos = np.where(ids == q)[0]
    assert labels[qpos[0]] == IGNORE_INDEX


def test_str2spi_parse():
    from gpt4roi_tpu.serve.chat import str2spi

    assert str2spi("look at <bbox>10 20 30 40</bbox> and <bbox>1 2 3 4</bbox>") == [
        [10.0, 20.0, 30.0, 40.0], [1.0, 2.0, 3.0, 4.0]]
    assert str2spi("no boxes here") == []


def test_sine_coordinate_encoding_from_spec():
    """Independent numpy oracle of the reference's coordinate_to_encoding
    (layers.py:39-71): interleaved sin/cos over a geometric freq ladder."""
    import numpy as np

    import jax.numpy as jnp
    from gpt4roi_tpu.models.spi import sine_coordinate_encoding

    rng = np.random.default_rng(0)
    coord = rng.random((3, 4)).astype(np.float32)
    got = np.asarray(sine_coordinate_encoding(jnp.asarray(coord), num_feats=8))

    scale = 2 * np.pi
    dim_t = np.arange(8, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / 8)

    def enc(v):
        p = v[:, None] * scale / dim_t
        return np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])], -1).reshape(len(v), -1)

    want = np.concatenate(
        [enc(coord[:, 1]), enc(coord[:, 0]), enc(coord[:, 2]), enc(coord[:, 3])], -1
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.shape == (3, 32)
