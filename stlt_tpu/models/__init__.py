"""Model factory (reference: src/modelling/models.py:552-559)."""

from stlt_tpu.models.stlt import Stlt, StltBackbone, ClassificationHead

models_factory = {
    "stlt": Stlt,
}


def __getattr__(name):
    # Lazily extend the factory as families land (appearance, fusion).
    raise AttributeError(name)
