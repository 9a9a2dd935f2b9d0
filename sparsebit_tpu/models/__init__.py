"""Model zoo built on sparsebit_tpu.nn — traceable by the QuantModel/
SparseModel pipeline (reference uses torchvision/timm/transformers models;
here the zoo is first-party so graph capture is robust, SURVEY.md §7).
"""

MODEL_REGISTRY = {}


def register_model(fn):
    MODEL_REGISTRY[fn.__name__] = fn
    return fn


def create_model(name, **kwargs):
    assert name in MODEL_REGISTRY, "unknown model {} (have: {})".format(
        name, sorted(MODEL_REGISTRY)
    )
    return MODEL_REGISTRY[name](**kwargs)


from sparsebit_tpu.models import (  # noqa: E402,F401
    resnet,
    mobilenet,
    efficientnet,
    regnet,
    vit,
    bert,
    gpt2,
    yolo,
    bevdet,
)
from sparsebit_tpu.models.resnet import (  # noqa: E402,F401
    resnet18,
    resnet20,
    resnet34,
    resnet50,
)
from sparsebit_tpu.models.mobilenet import mobilenet_v2  # noqa: E402,F401
from sparsebit_tpu.models.efficientnet import efficientnet_lite0  # noqa: E402,F401
from sparsebit_tpu.models.regnet import regnetx_600mf  # noqa: E402,F401
from sparsebit_tpu.models.vit import deit_tiny, deit_small, deit_base  # noqa: E402,F401
from sparsebit_tpu.models.bert import bert_base, bert_tiny  # noqa: E402,F401
from sparsebit_tpu.models.gpt2 import gpt2_small, gpt2_tiny  # noqa: E402,F401
