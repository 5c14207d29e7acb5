"""Method registry. Importing this package registers every CL method
(the explicit equivalent of reference core/model/__init__.py's star-imports)."""

from libcontinual_tpu.methods import (  # noqa: F401
    api,
    bic,
    cl_lora,
    clip_methods,
    dap,
    der,
    dmnsp,
    er,
    ewc,
    finetune,
    gpm,
    icarl,
    inflora,
    lorasub,
    lucir,
    lwf,
    minflora,
    ocm,
    praka,
    prompt_methods,
    ranpac,
    sdlora,
    trgp,
    wa,
)
