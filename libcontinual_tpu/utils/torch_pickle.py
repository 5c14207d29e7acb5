"""Torch-free reader for PyTorch zip checkpoints (``.pth``/``.pt``/``.bin``).

The reference framework ingests pretrained weights saved by torch — timm ViT
state dicts (reference core/model/backbone/vit.py:63-84) and OpenAI CLIP
checkpoints (reference clip.py:418-536). This framework has no torch
dependency, so this module implements just enough of ``torch.save``'s
serialization format to extract a flat ``{name: numpy array}`` state dict:

  * the container is a zipfile with ``<prefix>/data.pkl`` (the pickled object
    graph) plus one raw little-endian buffer per tensor storage under
    ``<prefix>/data/<key>``;
  * tensors appear in the pickle as ``torch._utils._rebuild_tensor_v2(
    storage, offset, size, stride, requires_grad, hooks[, metadata])`` where
    ``storage`` is a pickle *persistent id*
    ``('storage', <StorageClass>, key, location, numel)``.

The Unpickler below is tensor-only: it resolves exactly the handful of
globals that tensor state dicts need and refuses everything else, so it is
safe on untrusted checkpoint files (no arbitrary-code execution, unlike a
plain ``pickle.load``).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Dict

import numpy as np

try:  # bundled with jax
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class _StorageToken(str):
    """Marks a storage-class global resolved by find_class."""


def _rebuild_tensor_v2(storage, offset, size, stride, *_args):
    arr = storage  # 1-D numpy array for the whole storage
    offset = int(offset)
    if offset < 0 or offset > arr.size:
        raise ValueError(f"tensor storage offset {offset} out of bounds")
    if not size:
        if offset >= arr.size:
            raise ValueError("scalar tensor offset past end of storage")
        return arr[offset : offset + 1].reshape(())
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    # bounds-check pickle-supplied geometry BEFORE as_strided: a corrupt
    # checkpoint could otherwise declare a view past the buffer and leak
    # process memory (the module's untrusted-input guarantee)
    if any(s < 0 for s in size) or any(st < 0 for st in stride):
        raise ValueError("negative tensor size/stride in checkpoint")
    max_index = offset + sum(
        (s - 1) * st for s, st in zip(size, stride) if s > 0
    )
    numel = 1
    for s in size:
        numel *= s
    if numel > 0 and max_index >= arr.size:
        raise ValueError(
            f"tensor geometry (offset {offset}, size {size}, stride {stride}) "
            f"exceeds storage of {arr.size} elements"
        )
    itemsize = arr.dtype.itemsize
    strides = tuple(st * itemsize for st in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[offset:], shape=size, strides=strides
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, *_args):
    return data


_ALLOWED_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch.nn.parameter", "Parameter"): _rebuild_parameter,
    ("torch", "Size"): tuple,
    ("collections", "OrderedDict"): dict,
}


class _TensorUnpickler(pickle.Unpickler):
    def __init__(self, data_pkl: bytes, load_storage):
        super().__init__(io.BytesIO(data_pkl))
        self._load_storage = load_storage

    def find_class(self, module, name):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageToken(name)
        if module == "torch.storage" and name == "TypedStorage":
            return _StorageToken("TypedStorage")
        fn = _ALLOWED_GLOBALS.get((module, name))
        if fn is None:
            raise pickle.UnpicklingError(
                f"refusing non-tensor global {module}.{name} in checkpoint"
            )
        return fn

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, storage_cls, key, _location, _numel = pid
        dtype = _STORAGE_DTYPES.get(str(storage_cls))
        if dtype is None:
            raise pickle.UnpicklingError(f"unsupported storage type {storage_cls}")
        return self._load_storage(str(key), dtype)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch zip checkpoint into ``{key: numpy array}`` without torch.

    Handles ``torch.save``-format files (including ``state_dict()`` dumps and
    ``{"state_dict"|"model": ...}`` wrappers). Raises ``ValueError`` for the
    pre-1.6 legacy (non-zip) format and for TorchScript archives.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        data_pkl = next(
            (n for n in names if n == "data.pkl" or n.endswith("/data.pkl")), None
        )
        if data_pkl is None:
            if any(n.endswith("constants.pkl") for n in names):
                raise ValueError(
                    f"{path} is a TorchScript archive, not a state-dict "
                    "checkpoint; re-export with torch.save(model.state_dict())"
                )
            raise ValueError(f"{path}: no data.pkl — not a torch zip checkpoint")
        prefix = data_pkl[: -len("data.pkl")]
        cache: Dict[str, np.ndarray] = {}

        def load_storage(key: str, dtype: np.dtype) -> np.ndarray:
            if key not in cache:
                raw = zf.read(f"{prefix}data/{key}")
                cache[key] = np.frombuffer(raw, dtype=dtype)
            return cache[key]

        obj = _TensorUnpickler(zf.read(data_pkl), load_storage).load()

    for wrapper in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and wrapper in obj and isinstance(obj[wrapper], dict):
            obj = obj[wrapper]
            break
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: checkpoint root is {type(obj)}, expected dict")
    out = {}
    skipped_dicts = []
    for k, v in obj.items():
        if isinstance(v, np.ndarray):
            if _BFLOAT16 is not None and v.dtype == _BFLOAT16:
                v = v.astype(np.float32)
            elif v.dtype == np.float16:
                v = v.astype(np.float32)
            out[str(k)] = v
        elif isinstance(v, dict) and v:
            skipped_dicts.append(str(k))
    if skipped_dicts and not out:
        raise ValueError(
            f"{path}: checkpoint is nested (dict values under "
            f"{skipped_dicts[:5]}) — flatten it or name the inner state "
            "dict 'state_dict'/'model'"
        )
    return out
