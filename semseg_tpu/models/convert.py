"""PyTorch checkpoint -> flax variables converter.

Maps reference state_dicts (``model/pspnet.py`` / ``model/psanet.py``
module naming, optionally DDP ``module.``-prefixed, reference
``tool/test.py:112-113``) onto this framework's parameter pytree so
reference-trained checkpoints evaluate here with per-pixel parity.

Conventions converted:
- Conv2d ``weight`` OIHW -> HWIO kernels;
- BatchNorm ``weight/bias/running_mean/running_var`` ->
  ``scale/bias`` (params) + ``mean/var`` (batch_stats);
- Linear ``weight`` [out,in] -> kernel [in,out].

torch is imported lazily: it is only needed when actually converting.
"""

from __future__ import annotations

import numpy as np


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


class _StateDict:
    """Key-normalized accessor over a torch state_dict."""

    def __init__(self, sd):
        self.sd = {k[len("module."):] if k.startswith("module.") else k: v
                   for k, v in sd.items()}
        self.used = set()

    def __contains__(self, key):
        return key in self.sd

    def take(self, key):
        self.used.add(key)
        return np.asarray(self.sd[key].detach().cpu().numpy()
                          if hasattr(self.sd[key], "detach") else self.sd[key])

    def unused(self):
        skip = ("num_batches_tracked",)
        return sorted(
            k for k in self.sd
            if k not in self.used and not k.endswith(skip)
        )


def _convbn(sd, params, stats, torch_conv, torch_bn, path):
    """Copy a Conv2d+BatchNorm pair into a ConvBN subtree at ``path``."""
    _set(params, path + ("conv", "kernel"), _conv(sd.take(f"{torch_conv}.weight")))
    _set(params, path + ("bn", "scale"), sd.take(f"{torch_bn}.weight"))
    _set(params, path + ("bn", "bias"), sd.take(f"{torch_bn}.bias"))
    _set(stats, path + ("bn", "mean"), sd.take(f"{torch_bn}.running_mean"))
    _set(stats, path + ("bn", "var"), sd.take(f"{torch_bn}.running_var"))


_BLOCK_COUNTS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3),
                 18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


def _convert_backbone(sd, params, stats, layers, prefix=""):
    """Backbone layers. ``prefix`` handles both the seg-model naming
    (``layer0.0`` Sequential) and the raw ImageNet ResNet naming
    (``conv1``/``bn1``)."""
    seq_style = f"{prefix}layer0.0.weight" in sd
    stem = (
        [(f"{prefix}layer0.0", f"{prefix}layer0.1", "stem_cb1"),
         (f"{prefix}layer0.3", f"{prefix}layer0.4", "stem_cb2"),
         (f"{prefix}layer0.6", f"{prefix}layer0.7", "stem_cb3")]
        if seq_style
        else [(f"{prefix}conv1", f"{prefix}bn1", "stem_cb1"),
              (f"{prefix}conv2", f"{prefix}bn2", "stem_cb2"),
              (f"{prefix}conv3", f"{prefix}bn3", "stem_cb3")]
    )
    for conv_key, bn_key, name in stem:
        if f"{conv_key}.weight" in sd:
            _convbn(sd, params, stats, conv_key, bn_key, ("backbone", name))

    bottleneck = f"{prefix}layer1.0.conv3.weight" in sd
    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(_BLOCK_COUNTS[layers], start=1):
        for b in range(blocks):
            tb = f"{prefix}layer{stage}.{b}"
            ours = ("backbone", f"layer{stage}_block{b}")
            for ci in range(1, n_convs + 1):
                _convbn(sd, params, stats, f"{tb}.conv{ci}", f"{tb}.bn{ci}",
                        ours + (f"cb{ci}",))
            if f"{tb}.downsample.0.weight" in sd:
                _convbn(sd, params, stats, f"{tb}.downsample.0",
                        f"{tb}.downsample.1", ours + ("downsample",))


def _convert_head(sd, params, stats, torch_name, ours_name):
    """cls/aux heads: Sequential(conv, bn, relu, dropout, conv)."""
    if f"{torch_name}.0.weight" not in sd:
        return
    _convbn(sd, params, stats, f"{torch_name}.0", f"{torch_name}.1",
            (ours_name, "cb"))
    _set(params, (ours_name, "conv_logits", "kernel"),
         _conv(sd.take(f"{torch_name}.4.weight")))
    _set(params, (ours_name, "conv_logits", "bias"),
         sd.take(f"{torch_name}.4.bias"))


def convert_torch_state_dict(sd_raw, arch: str, layers: int):
    """Convert a reference seg-model state_dict.

    Returns ``{"params": ..., "batch_stats": ...}`` (plain nested dicts of
    np.float32 arrays) plus the list of unconsumed torch keys.
    """
    sd = _StateDict(sd_raw)
    params, stats = {}, {}
    _convert_backbone(sd, params, stats, layers)

    if arch == "psp":
        for i in range(4):
            _convbn(sd, params, stats, f"ppm.features.{i}.1",
                    f"ppm.features.{i}.2", ("ppm", f"branch{i}"))
    elif arch == "psa":
        pairs = [
            ("psa.reduce", "reduce"),
            ("psa.reduce_p", "reduce_p"),
        ]
        for torch_name, ours in pairs:
            if f"{torch_name}.0.weight" in sd:
                _convbn(sd, params, stats, f"{torch_name}.0",
                        f"{torch_name}.1", ("psa", ours))
        att_pairs = [("psa.attention", ""), ("psa.attention_p", "_p")]
        for torch_name, suffix in att_pairs:
            if f"{torch_name}.0.weight" in sd:
                _convbn(sd, params, stats, f"{torch_name}.0",
                        f"{torch_name}.1", ("psa", f"attention{suffix}_cb"))
                _set(params, ("psa", f"attention{suffix}_conv", "kernel"),
                     _conv(sd.take(f"{torch_name}.3.weight")))
        _convbn(sd, params, stats, "psa.proj.0", "psa.proj.1", ("psa", "proj"))
    else:
        raise ValueError(arch)

    _convert_head(sd, params, stats, "cls", "cls")
    _convert_head(sd, params, stats, "aux", "aux")
    return {"params": params, "batch_stats": stats}, sd.unused()


def convert_imagenet_resnet(sd_raw, layers: int):
    """Convert a deep-base ImageNet ResNet checkpoint (the reference's
    ``initmodel/resnet{50,101,152}_v2.pth``, ``model/resnet.py:199``) into a
    backbone subtree for fine-tuning initialization."""
    sd = _StateDict(sd_raw)
    params, stats = {}, {}
    _convert_backbone(sd, params, stats, layers)
    if "fc.weight" in sd:
        _set(params, ("fc", "kernel"), np.asarray(sd.take("fc.weight")).T)
        _set(params, ("fc", "bias"), sd.take("fc.bias"))
    return {"params": params, "batch_stats": stats}, sd.unused()


def load_torch_checkpoint(path: str):
    """Load a .pth file, returning the inner state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> reference torch state_dict.
#
# Closes the interop loop: reference checkpoints already load here; this
# lets checkpoints trained HERE be consumed by the reference tools
# (``/root/reference/tool/test.py:107-116`` expects a torch ``.pth`` whose
# DDP-saved keys carry a ``module.`` prefix and loads strict=False).
# ---------------------------------------------------------------------------


def _conv_back(kernel) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.ascontiguousarray(np.asarray(kernel).transpose(3, 2, 0, 1))


class _Emitter:
    def __init__(self, params, stats, prefix="module."):
        self.params = params
        self.stats = stats
        self.prefix = prefix
        self.out = {}

    def _get(self, tree, path):
        node = tree
        for key in path:
            node = node[key]
        return np.asarray(node, dtype=np.float32)

    def convbn(self, ours_path, torch_conv, torch_bn):
        self.out[f"{self.prefix}{torch_conv}.weight"] = _conv_back(
            self._get(self.params, ours_path + ("conv", "kernel"))
        )
        self.out[f"{self.prefix}{torch_bn}.weight"] = self._get(
            self.params, ours_path + ("bn", "scale"))
        self.out[f"{self.prefix}{torch_bn}.bias"] = self._get(
            self.params, ours_path + ("bn", "bias"))
        self.out[f"{self.prefix}{torch_bn}.running_mean"] = self._get(
            self.stats, ours_path + ("bn", "mean"))
        self.out[f"{self.prefix}{torch_bn}.running_var"] = self._get(
            self.stats, ours_path + ("bn", "var"))
        self.out[f"{self.prefix}{torch_bn}.num_batches_tracked"] = np.asarray(
            0, dtype=np.int64)

    def head(self, ours_name, torch_name):
        if ours_name not in self.params:
            return
        self.convbn((ours_name, "cb"), f"{torch_name}.0", f"{torch_name}.1")
        self.out[f"{self.prefix}{torch_name}.4.weight"] = _conv_back(
            self._get(self.params, (ours_name, "conv_logits", "kernel")))
        self.out[f"{self.prefix}{torch_name}.4.bias"] = self._get(
            self.params, (ours_name, "conv_logits", "bias"))


def export_torch_state_dict(variables, arch: str, layers: int,
                            ddp_prefix: bool = True):
    """Map ``{"params", "batch_stats"}`` onto the reference seg-model
    state_dict naming (``model/pspnet.py`` / ``model/psanet.py`` module
    tree, DDP ``module.``-prefixed by default like reference-trained
    checkpoints). Returns ``{name: np.ndarray}``."""
    em = _Emitter(variables["params"], variables["batch_stats"],
                  prefix="module." if ddp_prefix else "")
    backbone = variables["params"]["backbone"]
    stem = [("stem_cb1", "layer0.0", "layer0.1"),
            ("stem_cb2", "layer0.3", "layer0.4"),
            ("stem_cb3", "layer0.6", "layer0.7")]
    for name, torch_conv, torch_bn in stem:
        if name in backbone:
            em.convbn(("backbone", name), torch_conv, torch_bn)
    for stage, blocks in enumerate(_BLOCK_COUNTS[layers], start=1):
        for b in range(blocks):
            ours = ("backbone", f"layer{stage}_block{b}")
            block = backbone[f"layer{stage}_block{b}"]
            n_convs = 3 if "cb3" in block else 2
            for ci in range(1, n_convs + 1):
                em.convbn(ours + (f"cb{ci}",), f"layer{stage}.{b}.conv{ci}",
                          f"layer{stage}.{b}.bn{ci}")
            if "downsample" in block:
                em.convbn(ours + ("downsample",), f"layer{stage}.{b}.downsample.0",
                          f"layer{stage}.{b}.downsample.1")

    if arch == "psp":
        for i in range(4):
            em.convbn(("ppm", f"branch{i}"), f"ppm.features.{i}.1",
                      f"ppm.features.{i}.2")
    elif arch == "psa":
        psa = variables["params"]["psa"]
        if "reduce" in psa:
            em.convbn(("psa", "reduce"), "psa.reduce.0", "psa.reduce.1")
        if "reduce_p" in psa:
            em.convbn(("psa", "reduce_p"), "psa.reduce_p.0", "psa.reduce_p.1")
        for suffix, torch_name in (("", "psa.attention"),
                                   ("_p", "psa.attention_p")):
            if f"attention{suffix}_cb" in psa:
                em.convbn(("psa", f"attention{suffix}_cb"),
                          f"{torch_name}.0", f"{torch_name}.1")
                em.out[f"{em.prefix}{torch_name}.3.weight"] = _conv_back(
                    em._get(em.params,
                            ("psa", f"attention{suffix}_conv", "kernel")))
        em.convbn(("psa", "proj"), "psa.proj.0", "psa.proj.1")
    else:
        raise ValueError(arch)

    em.head("cls", "cls")
    em.head("aux", "aux")
    return em.out


def export_pth(path: str, variables, arch: str, layers: int,
               epoch: int = 0) -> str:
    """Write a reference-consumable ``.pth`` checkpoint
    (``{"epoch", "state_dict"}``, DDP-prefixed keys)."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(variables, arch, layers).items()
    }
    torch.save({"epoch": int(epoch), "state_dict": sd}, path)
    return path
