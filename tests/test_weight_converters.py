"""Round-trip tests for the torchvision->flax weight converters.

torchvision is not installed in this environment, so we synthesize
state dicts with torchvision's exact key layout and shapes *derived from
the flax variable trees by inverting the converter's mapping*, run the
converters, reload through load_params, and assert every flax leaf was
replaced with the expected transposed values. This validates the key
mapping and axis transposes end-to-end; only the actual pretrained values
must be supplied externally (MOVAE_{INCEPTION,VGG16}_WEIGHTS).
"""

import numpy as np
import pytest
from flax import traverse_util


def _fill(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


def test_inception_converter_round_trip(tmp_path):
    from movae_tpu.metrics import inception as inc

    variables = inc.load_params(None)  # random-init tree = shape source
    var_flat = traverse_util.flatten_dict(variables, sep="/")

    torch_sd = {}
    expected = {}
    for i, (k, v) in enumerate(sorted(var_flat.items())):
        parts = k.split("/")
        arr = _fill(np.shape(v), i)
        if parts[0] == "params" and parts[-1] == "kernel" and parts[1] == "fc":
            torch_sd["fc.weight"] = arr.T  # torch fc: (out, in)
        elif parts[0] == "params" and parts[1] == "fc":
            torch_sd["fc.bias"] = arr
        elif parts[-1] == "kernel":
            # flax HWIO -> torch OIHW
            torch_sd[".".join(parts[1:-1]) + ".weight"] = arr.transpose(
                3, 2, 0, 1)
        elif parts[-1] == "scale":
            torch_sd[".".join(parts[1:-1]) + ".weight"] = arr
        elif parts[-1] == "bias":
            torch_sd[".".join(parts[1:-1]) + ".bias"] = arr
        elif parts[-1] == "mean":
            torch_sd[".".join(parts[1:-1]) + ".running_mean"] = arr
        elif parts[-1] == "var":
            torch_sd[".".join(parts[1:-1]) + ".running_var"] = arr
        else:
            pytest.fail(f"unexpected leaf {k}")
        expected[k] = arr

    out = str(tmp_path / "inception.npz")
    inc.convert_torch_weights(torch_sd, out)
    loaded = traverse_util.flatten_dict(inc.load_params(out), sep="/")
    assert set(loaded) == set(expected)
    for k in expected:
        np.testing.assert_allclose(np.asarray(loaded[k]), expected[k],
                                   err_msg=k)


def test_vgg_converter_round_trip(tmp_path):
    from movae_tpu.metrics import vgg

    variables = vgg.load_params(None)
    var_flat = traverse_util.flatten_dict(variables, sep="/")

    # invert the features.N index mapping used by the converter
    idx_of = {}
    idx = 0
    for item in vgg._VGG_PLAN:
        if item == "M":
            idx += 1
            continue
        idx_of[item[0]] = idx
        idx += 2

    torch_sd = {}
    expected = {}
    for i, (k, v) in enumerate(sorted(var_flat.items())):
        parts = k.split("/")  # params/<name>/{kernel,bias}
        name = parts[1]
        arr = _fill(np.shape(v), 1000 + i)
        ti = idx_of[name]
        if parts[-1] == "kernel":
            torch_sd[f"features.{ti}.weight"] = arr.transpose(3, 2, 0, 1)
        else:
            torch_sd[f"features.{ti}.bias"] = arr
        expected[k] = arr

    out = str(tmp_path / "vgg16.npz")
    vgg.convert_torch_weights(torch_sd, out)
    loaded = traverse_util.flatten_dict(vgg.load_params(out), sep="/")
    assert set(loaded) == set(expected)
    for k in expected:
        np.testing.assert_allclose(np.asarray(loaded[k]), expected[k],
                                   err_msg=k)
