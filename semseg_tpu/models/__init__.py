"""Model zoo: deep-base dilated ResNet backbones, PSPNet, PSANet."""

from semseg_tpu.models.resnet import (
    ResNet,
    ResNetClassifier,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from semseg_tpu.models.pspnet import PPM, PSPNet
from semseg_tpu.models.psanet import PSA, PSANet
from semseg_tpu.models.build import build_model

__all__ = [
    "ResNet",
    "ResNetClassifier",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "PPM",
    "PSPNet",
    "PSA",
    "PSANet",
    "build_model",
]
