"""Method registry. Importing this package registers every CL method
(the explicit equivalent of reference core/model/__init__.py's star-imports)."""

from libcontinual_tpu.methods import (  # noqa: F401
    bic,
    der,
    ewc,
    finetune,
    gpm,
    icarl,
    lucir,
    lwf,
    prompt_methods,
    wa,
)
