"""Finetune — the naive sequential baseline (reference core/model/finetune.py).

Plain cross-entropy on the full head; no forgetting mitigation. The base
``Method`` already implements exactly these semantics; this subclass only
registers the name.
"""

from libcontinual_tpu.core.method import Method
from libcontinual_tpu.registry import METHODS


@METHODS.register("Finetune")
class Finetune(Method):
    pass
