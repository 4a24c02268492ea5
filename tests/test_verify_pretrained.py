"""tools/verify_pretrained.py: the drop-in pretrained-weight validator,
exercised with synthetic torch state_dicts standing in for the real
(unavailable-offline) torchvision files (VERDICT r2 missing #1)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.oracle import torch_ref
from tools import verify_pretrained as vp


@pytest.fixture(scope="module")
def vgg_file(tmp_path_factory):
    torch.manual_seed(0)
    sd = torch_ref.VGG16Features().state_dict()
    # a real torchvision vgg16 checkpoint also carries deeper convs +
    # classifier weights the importer must ignore
    sd["classifier.0.weight"] = torch.zeros(8, 8)
    path = tmp_path_factory.mktemp("w") / "vgg16.pth"
    torch.save(sd, path)
    return str(path)


@pytest.fixture(scope="module")
def mobilenet_file(tmp_path_factory):
    torch.manual_seed(1)
    oracle_sd = torch_ref.MobileNetV2Encoder(width_mult=1.0, output_stride=8).state_dict()
    tv_sd = vp.oracle_to_tv_mobilenet(oracle_sd)
    # torchvision extras the importer must tolerate
    tv_sd["features.18.0.weight"] = torch.zeros(1280, 320, 1, 1)
    tv_sd["classifier.1.weight"] = torch.zeros(1000, 1280)
    path = tmp_path_factory.mktemp("w") / "mobilenet_v2.pth"
    torch.save(tv_sd, path)
    return str(path)


def test_verify_vgg16_passes(vgg_file):
    out = vp.verify_vgg16(vgg_file, size=32)
    assert out["ok"], out
    assert out["max_abs_err"] < 1e-4
    assert out["coverage"]["unfilled"] == 0


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_verify_mobilenet_passes(mobilenet_file):
    out = vp.verify_mobilenet(mobilenet_file, size=64)
    assert out["ok"], out
    assert max(out["tap_max_abs_err"].values()) < 5e-4
    assert not out["segmenter_encoder_unfilled"]


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_cli_verdict_line(vgg_file, mobilenet_file, capsys):
    rc = vp.main(["--vgg16", vgg_file, "--mobilenet", mobilenet_file, "--size", "32"])
    assert rc == 0
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdict["ok"] and verdict["vgg16"]["ok"] and verdict["mobilenet_v2"]["ok"]


def test_corrupted_weights_fail(vgg_file, tmp_path):
    """A shape-mangled file must NOT pass the gate."""
    sd = torch.load(vgg_file, weights_only=True)
    sd["features.2.weight"] = torch.zeros(7, 7, 3, 3)  # wrong out-channels
    bad = tmp_path / "bad.pth"
    torch.save(sd, bad)
    out = vp.verify_vgg16(str(bad), size=32)
    assert not out["ok"]


def test_name_pair_roundtrip():
    """tv<->oracle rename tables are inverses over the encoder keys."""
    oracle_sd = {
        k: np.zeros(1)
        for k in torch_ref.MobileNetV2Encoder(1.0, 8).state_dict()
        if not k.endswith("num_batches_tracked")
    }
    back = vp.tv_to_oracle_mobilenet(vp.oracle_to_tv_mobilenet(oracle_sd))
    assert set(back) == set(oracle_sd)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_fabricate_writes_loadable_files(tmp_path):
    """--fabricate produces torchvision-layout files that pass both
    import gates (the transcript recipe's first leg)."""
    made = vp.fabricate(str(tmp_path / "fab"))
    assert vp.verify_vgg16(made["vgg16"], size=32)["ok"]
    out = vp.verify_mobilenet(made["mobilenet"], size=64)
    assert out["ok"], out


@pytest.mark.slow
def test_finetune_smoke_gates(mobilenet_file):
    """The --finetune leg: loss must decrease over a short real-train
    run with the imported encoder merged in (compiles a train step)."""
    out = vp.finetune_smoke(mobilenet_file, steps=12, size=64, batch=2)
    assert out["ok"], out
    assert out["loss_last_quarter"] < out["loss_first_quarter"]
    assert not out["encoder_unfilled"]
