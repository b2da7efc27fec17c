"""LPIPS-in-JAX vs a torch reference built from identical weights
(reference lpipsPyTorch/modules/*). Pretrained files don't exist in this
environment, so correctness is established on random weights with the exact
pretrained layout — the computation (convs, pools, z-score, channel
normalization, linear heads, assembly) is what's under test."""

import numpy as np
import pytest

from ed3dgs_tpu.utils.lpips_jax import (LPIPS, _SPECS, load_lpips,
                                        random_params)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_lpips(params, x, y, net_type):
    """Independent torch evaluation of the same spec + weights, mirroring
    reference lpipsPyTorch/modules/lpips.py:30-36 and networks.py:52-62."""
    spec, taps, channels = _SPECS[net_type]
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(t):
        h = (t - shift) / scale
        out = []
        conv_i = 0
        for i, layer in enumerate(spec, 1):
            if layer[0] == "conv":
                _, cin, cout, k, s, p = layer
                w = torch.tensor(params[f"conv{conv_i}_w"])
                b = torch.tensor(params[f"conv{conv_i}_b"])
                conv_i += 1
                h = F.conv2d(h, w, b, stride=s, padding=p)
            elif layer[0] == "relu":
                h = F.relu(h)
            elif layer[0] == "pool":
                _, k, s = layer
                h = F.max_pool2d(h, k, s)
            if i in taps:
                out.append(h / (h.norm(dim=1, keepdim=True) + 1e-10))
            if len(out) == len(taps):
                break
        return out

    fx, fy = feats(torch.tensor(x)), feats(torch.tensor(y))
    total = torch.zeros(x.shape[0])
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        lin = torch.tensor(params[f"lin{i}_w"]).view(1, -1, 1, 1)
        total = total + (d * lin).sum(dim=1, keepdim=True).mean(dim=(1, 2, 3))
    return total.numpy()


@pytest.mark.parametrize("net_type", ["alex", "vgg"])
def test_lpips_matches_torch(net_type):
    params = random_params(net_type, seed=0)
    rng = np.random.default_rng(1)
    # alexnet needs >= 67 px input for 5 taps through stride-4 + 3 pools
    x = rng.random((2, 3, 96, 96)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    want = _torch_lpips(params, x, y, net_type)
    got = np.asarray(LPIPS(params, net_type)(x, y))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_identity_is_zero():
    params = random_params("alex", seed=0)
    rng = np.random.default_rng(2)
    x = rng.random((1, 3, 96, 96)).astype(np.float32)
    val = float(LPIPS(params, "alex")(x, x)[0])
    assert abs(val) < 1e-8


def test_load_lpips_resolution(tmp_path, monkeypatch):
    # no weights anywhere -> None (metrics reports null)
    monkeypatch.delenv("ED3DGS_LPIPS_WEIGHTS_ALEX", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    assert load_lpips("alex") is None
    # env-var weights load
    p = tmp_path / "w.npz"
    np.savez(p, **random_params("alex"))
    monkeypatch.setenv("ED3DGS_LPIPS_WEIGHTS_ALEX", str(p))
    model = load_lpips("alex")
    assert model is not None
    x = np.zeros((1, 3, 96, 96), np.float32)
    assert np.isfinite(float(model(x, x)[0]))


def test_convert_torch_checkpoints(tmp_path):
    """Converter maps torchvision features.<idx> + richzhang lin<i>.model.1
    key layouts to the npz layout, and the result evaluates."""
    from ed3dgs_tpu.utils.lpips_jax import convert_torch_checkpoints
    spec, taps, channels = _SPECS["alex"]
    rng = np.random.default_rng(3)
    bstate, hstate = {}, {}
    for idx0, layer in enumerate(spec):
        if layer[0] != "conv":
            continue
        _, cin, cout, k, s, p = layer
        bstate[f"features.{idx0}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32))
        bstate[f"features.{idx0}.bias"] = torch.tensor(
            rng.normal(0, 0.1, cout).astype(np.float32))
    for i, c in enumerate(channels):
        hstate[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32))
    torch.save(bstate, tmp_path / "alexnet.pth")
    torch.save(hstate, tmp_path / "alex_heads.pth")
    out = tmp_path / "lpips_alex.npz"
    convert_torch_checkpoints("alex", str(tmp_path / "alexnet.pth"),
                              str(tmp_path / "alex_heads.pth"), str(out))
    with np.load(out) as d:
        params = dict(d)
    x = rng.random((1, 3, 96, 96)).astype(np.float32)
    y = rng.random((1, 3, 96, 96)).astype(np.float32)
    want = _torch_lpips(params, x, y, "alex")
    got = np.asarray(LPIPS(params, "alex")(x, y))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def _fake_torch_checkpoints(tmp_path, net="alex"):
    spec, taps, channels = _SPECS[net]
    rng = np.random.default_rng(9)
    bstate, hstate = {}, {}
    for idx0, layer in enumerate(spec):
        if layer[0] != "conv":
            continue
        _, cin, cout, k, s, p = layer
        bstate[f"features.{idx0}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32))
        bstate[f"features.{idx0}.bias"] = torch.tensor(
            rng.normal(0, 0.1, cout).astype(np.float32))
    for i, c in enumerate(channels):
        hstate[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32))
    return bstate, hstate


def test_autoconvert_from_torch_hub_cache(tmp_path, monkeypatch):
    """If the torchvision backbone appears in the torch hub cache and the
    richzhang heads in the ed3dgs cache, LPIPS lights up with NO code or env
    changes (VERDICT r1 item 8)."""
    import os
    monkeypatch.delenv("ED3DGS_LPIPS_WEIGHTS_ALEX", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch"))
    hub = tmp_path / "torch" / "hub" / "checkpoints"
    hub.mkdir(parents=True)
    cache = tmp_path / ".cache" / "ed3dgs_tpu"
    cache.mkdir(parents=True)
    bstate, hstate = _fake_torch_checkpoints(tmp_path)
    torch.save(bstate, hub / "alexnet-owt-7be5be79.pth")
    torch.save(hstate, cache / "lpips_heads_alex.pth")

    model = load_lpips("alex")
    assert model is not None
    # the conversion was cached as the canonical npz
    assert os.path.exists(cache / "lpips_alex.npz")
    x = np.zeros((1, 3, 64, 64), np.float32)
    assert float(model(x, x)[0]) == pytest.approx(0.0, abs=1e-6)


def test_lpips_cli(tmp_path, monkeypatch, capsys):
    from ed3dgs_tpu.utils.lpips_jax import _main
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.delenv("TORCH_HOME", raising=False)
    bstate, hstate = _fake_torch_checkpoints(tmp_path)
    torch.save(bstate, tmp_path / "b.pth")
    torch.save(hstate, tmp_path / "h.pth")
    out = tmp_path / "out.npz"
    assert _main(["convert", "--net", "alex", "--backbone",
                  str(tmp_path / "b.pth"), "--heads", str(tmp_path / "h.pth"),
                  "--out", str(out)]) == 0
    assert out.exists()
    assert _main(["status"]) == 0
    assert "alex:" in capsys.readouterr().out
