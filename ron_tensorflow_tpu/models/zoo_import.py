"""Torchvision-format weight import for the backbone zoo.

Makes the zoo usable with pretrained weights: a torchvision
`inception_v3` state_dict (the standard public checkpoint layout,
`Inception_V3_Weights.IMAGENET1K_V1` et al.) maps onto our flax
`InceptionV3` — conv OIHW -> HWIO, BN affine + running stats, final fc.
The reference's analogous intent is the Keras-weights loading scope of its
xception port (ref: nets/xception.py:156-283) — weights flow in from the
canonical public implementation rather than being retrained.

Logit parity vs a torch forward with the same state_dict is tested in
tests/test_zoo.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

# torchvision module name -> our flax ConvBN name, per block family.
_STEM = {
    "Conv2d_1a_3x3": "stem1",
    "Conv2d_2a_3x3": "stem2",
    "Conv2d_2b_3x3": "stem3",
    "Conv2d_3b_1x1": "stem4",
    "Conv2d_4a_3x3": "stem5",
}
_A = {
    "branch1x1": "b0_1x1",
    "branch5x5_1": "b1_1x1",
    "branch5x5_2": "b1_5x5",
    "branch3x3dbl_1": "b2_1x1",
    "branch3x3dbl_2": "b2_3x3a",
    "branch3x3dbl_3": "b2_3x3b",
    "branch_pool": "b3_1x1",
}
_B = {
    "branch3x3": "b0_3x3",
    "branch3x3dbl_1": "b1_1x1",
    "branch3x3dbl_2": "b1_3x3a",
    "branch3x3dbl_3": "b1_3x3b",
}
_C = {
    "branch1x1": "b0_1x1",
    "branch7x7_1": "b1_1x1",
    "branch7x7_2": "b1_1x7",
    "branch7x7_3": "b1_7x1",
    "branch7x7dbl_1": "b2_1x1",
    "branch7x7dbl_2": "b2_7x1a",
    "branch7x7dbl_3": "b2_1x7a",
    "branch7x7dbl_4": "b2_7x1b",
    "branch7x7dbl_5": "b2_1x7b",
    "branch_pool": "b3_1x1",
}
_D = {
    "branch3x3_1": "b0_1x1",
    "branch3x3_2": "b0_3x3",
    "branch7x7x3_1": "b1_1x1",
    "branch7x7x3_2": "b1_1x7",
    "branch7x7x3_3": "b1_7x1",
    "branch7x7x3_4": "b1_3x3",
}
_E = {
    "branch1x1": "b0_1x1",
    "branch3x3_1": "b1_1x1",
    "branch3x3_2a": "b1_1x3",
    "branch3x3_2b": "b1_3x1",
    "branch3x3dbl_1": "b2_1x1",
    "branch3x3dbl_2": "b2_3x3",
    "branch3x3dbl_3a": "b2_1x3",
    "branch3x3dbl_3b": "b2_3x1",
    "branch_pool": "b3_1x1",
}
_MIXED = {
    "Mixed_5b": ("mixed_5b", _A),
    "Mixed_5c": ("mixed_5c", _A),
    "Mixed_5d": ("mixed_5d", _A),
    "Mixed_6a": ("mixed_6a", _B),
    "Mixed_6b": ("mixed_6b", _C),
    "Mixed_6c": ("mixed_6c", _C),
    "Mixed_6d": ("mixed_6d", _C),
    "Mixed_6e": ("mixed_6e", _C),
    "Mixed_7a": ("mixed_7a", _D),
    "Mixed_7b": ("mixed_7b", _E),
    "Mixed_7c": ("mixed_7c", _E),
}


def _to_np(v) -> np.ndarray:
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def inception_v3_from_torch(state_dict: Dict[str, Any]) -> Dict:
    """torchvision inception_v3 state_dict -> flax variables for
    `zoo.InceptionV3(num_classes=1000)`.

    Returns {'params': ..., 'batch_stats': ...}. AuxLogits.* entries are
    ignored (train-time-only head, absent from our model).
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_convbn(flax_path: Tuple[str, ...], torch_prefix: str):
        # ConvBN param layout: <block>/<branch>/conv/{conv:{kernel}, bn:...}
        node = params
        for p in flax_path + ("conv",):
            node = node.setdefault(p, {})
        node["conv"] = {
            "kernel": np.transpose(sd[f"{torch_prefix}.conv.weight"], (2, 3, 1, 0))
        }
        node["bn"] = {
            "scale": sd[f"{torch_prefix}.bn.weight"],
            "bias": sd[f"{torch_prefix}.bn.bias"],
        }
        snode = stats
        for p in flax_path + ("conv",):
            snode = snode.setdefault(p, {})
        snode["bn"] = {
            "mean": sd[f"{torch_prefix}.bn.running_mean"],
            "var": sd[f"{torch_prefix}.bn.running_var"],
        }

    for torch_name, flax_name in _STEM.items():
        put_convbn((flax_name,), torch_name)
    for torch_block, (flax_block, table) in _MIXED.items():
        for torch_branch, flax_branch in table.items():
            put_convbn((flax_block, flax_branch), f"{torch_block}.{torch_branch}")

    params["logits"] = {
        "kernel": np.transpose(sd["fc.weight"], (1, 0)),
        "bias": sd["fc.bias"],
    }
    return {"params": params, "batch_stats": stats}
