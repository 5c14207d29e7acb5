from libcontinual_tpu.utils.logging import Logger, get_logger  # noqa: F401
from libcontinual_tpu.utils.meters import AverageMeter  # noqa: F401
from libcontinual_tpu.utils.seeding import init_seed  # noqa: F401
