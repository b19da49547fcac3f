"""Model zoo: SV / VN / original / BiPointNet × PointNet / DGCNN × cls / partseg.

Exports mirror the reference's models/__init__.py:1-16 class names, plus a
``get_model`` registry keyed on the CLI ``--model`` flag (and fixes the
reference's dead wiring so ``--model original`` actually runs — see
SURVEY.md §2.10).
"""

from svnet_tpu.models.sv_dgcnn import SV_DGCNN_CLS, SV_DGCNN_PSEG
from svnet_tpu.models.sv_pointnet import (
    SVPointNetEncoder,
    SV_PointNet_CLS,
    SV_PointNet_PSEG,
)
from svnet_tpu.models.vn_dgcnn import VN_DGCNN_CLS, VN_DGCNN_PSEG
from svnet_tpu.models.vn_pointnet import VN_PointNet_CLS, VN_PointNet_PSEG
from svnet_tpu.models.pointnet import PointNet_CLS, PointNet_PSEG
from svnet_tpu.models.dgcnn import DGCNN_CLS, DGCNN_PSEG
from svnet_tpu.models.bipointnet import (
    BiPointNet_CLS,
    BiPointNet_PSEG,
    BiPointNet_SEMSEG,
    BiPointNetLSREMax,
    BiPointNetPartSegLSREMax,
)

_CLS_REGISTRY = {
    "svnet": {"pointnet": SV_PointNet_CLS, "dgcnn": SV_DGCNN_CLS},
    "vn": {"pointnet": VN_PointNet_CLS, "dgcnn": VN_DGCNN_CLS},
    "original": {"pointnet": PointNet_CLS, "dgcnn": DGCNN_CLS},
    "bipointnet": {"pointnet": BiPointNet_CLS},
}

_PSEG_REGISTRY = {
    "svnet": {"pointnet": SV_PointNet_PSEG, "dgcnn": SV_DGCNN_PSEG},
    "vn": {"pointnet": VN_PointNet_PSEG, "dgcnn": VN_DGCNN_PSEG},
    "original": {"pointnet": PointNet_PSEG, "dgcnn": DGCNN_PSEG},
    "bipointnet": {"pointnet": BiPointNet_PSEG},
}


def get_model(task: str, backbone: str, model: str, **kwargs):
    """Build a model by (task, backbone, --model flag).

    task: 'cls' | 'partseg'; backbone: 'pointnet' | 'dgcnn';
    model: 'original' | 'vn' | 'svnet' | 'bipointnet'.
    kwargs forwarded to the flax module (num_classes/num_part, k, binary, ...).
    """
    registry = {"cls": _CLS_REGISTRY, "partseg": _PSEG_REGISTRY}[task]
    try:
        cls = registry[model][backbone]
    except KeyError:
        raise ValueError(
            f"no model {model!r} for task={task!r} backbone={backbone!r}; "
            f"available: { {m: sorted(b) for m, b in registry.items()} }"
        ) from None
    return cls(**kwargs)


__all__ = [
    "SV_DGCNN_CLS",
    "SV_DGCNN_PSEG",
    "SVPointNetEncoder",
    "SV_PointNet_CLS",
    "SV_PointNet_PSEG",
    "VN_DGCNN_CLS",
    "VN_DGCNN_PSEG",
    "VN_PointNet_CLS",
    "VN_PointNet_PSEG",
    "PointNet_CLS",
    "PointNet_PSEG",
    "DGCNN_CLS",
    "DGCNN_PSEG",
    "BiPointNet_CLS",
    "BiPointNet_PSEG",
    "BiPointNet_SEMSEG",
    "BiPointNetLSREMax",
    "BiPointNetPartSegLSREMax",
    "get_model",
]
