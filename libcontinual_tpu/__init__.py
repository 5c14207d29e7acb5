"""libcontinual_tpu — a TPU-native continual-learning framework.

A ground-up JAX/Flax/pjit/Pallas re-design of the capability surface of
RL-VIG/LibContinual (reference mounted at /root/reference): YAML-driven
task-incremental training, a zoo of continual-learning methods
(regularization, rehearsal, dynamic-architecture, gradient-projection,
prompt, LoRA/adapter families), ResNet/AlexNet/ViT/CLIP backbones, replay
buffers, and the standard CL metric suite (acc table, forgetting, BWT).

Design stance (TPU-first, not a port):
  * All shapes are static: the classifier head is allocated at full
    ``num_class`` up front and masked per task (the reference masks logits
    anyway, cf. reference l2p.py:92-99), so no recompilation across tasks.
  * Methods are functional: explicit ``TrainState`` pytrees + pure
    ``train_step`` / ``eval_step`` compiled once; task-boundary work
    (SVD, herding, classifier solves) runs in jitted helpers.
  * Data lives on device; augmentation is in-graph; a whole epoch can run
    as one ``lax.scan`` XLA program.
  * Scaling is a ``jax.sharding.Mesh`` + NamedSharding; metrics reduce via
    XLA collectives, replacing the reference's dead NCCL path
    (reference core/trainer.py:37-38).
"""

__version__ = "0.1.0"

from libcontinual_tpu.config import Config  # noqa: F401
