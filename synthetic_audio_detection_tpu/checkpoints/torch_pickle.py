"""Self-contained reader/writer for PyTorch ``.pth`` checkpoint files.

The reference persists everything with ``torch.save``/``torch.load``
(reference: submodel_trainer.py:703-715, model_merger.py:153-159,
inference_runner.py:82-86). To round-trip those checkpoints without putting
torch on the serving path, this module implements the on-disk format directly:

- **Zip format** (torch >= 1.6 default): a zip archive containing
  ``<name>/data.pkl`` (a pickle stream whose tensors are persistent-id
  references) plus one ``<name>/data/<key>`` raw little-endian buffer per
  storage.
- **Legacy format**: a bare pickle stream with magic/protocol headers followed
  by serialized storages.

Reading uses a *restricted* unpickler: only the handful of globals torch
checkpoints actually reference are constructible; everything else raises — so
loading an untrusted ``.pth`` cannot execute code through this path.

Tensors are surfaced as NumPy arrays. The writer emits zip-format files that
``torch.load`` reads back identically (tests/test_torch_pickle.py uses real
torch as the oracle).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict, Tuple, Union

import numpy as np

# torch storage type name → numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": np.dtype("<u2"),  # no numpy bf16; widened on read
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """View uint16 bfloat16 payload as float32 (zero-pad the mantissa)."""
    return (raw.astype(np.uint32) << 16).view(np.float32)


class _StoragePlaceholder:
    """Stands in for a torch storage until tensor rebuild resolves it."""

    __slots__ = ("key", "dtype", "numel", "is_bf16")

    def __init__(self, key: str, dtype: np.dtype, numel: int, is_bf16: bool):
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self.is_bf16 = is_bf16


class _LazyTensor:
    """Tensor view over a storage placeholder; materialized once buffers load."""

    __slots__ = ("storage", "offset", "size", "stride", "_array")

    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride)
        self._array = None

    def materialize(self, buffers: Dict[str, bytes]) -> np.ndarray:
        if self._array is not None:
            return self._array
        st = self.storage
        raw_dtype = np.dtype("<u2") if st.is_bf16 else st.dtype
        flat = np.frombuffer(buffers[st.key], dtype=raw_dtype)
        if st.is_bf16:
            flat = _bf16_to_f32(flat)
        if self.size:
            arr = np.lib.stride_tricks.as_strided(
                flat[self.offset:],
                shape=self.size,
                strides=tuple(s * flat.itemsize for s in self.stride),
            )
        else:
            arr = flat[self.offset:self.offset + 1].reshape(())
        self._array = np.ascontiguousarray(arr)
        return self._array


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    return _LazyTensor(storage, int(storage_offset), size, stride)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _LazyTensor(storage, int(storage_offset), size, stride)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _TorchClassStub:
    """Inert constructible stand-in for misc torch classes (Size, dtypes)."""

    def __init__(self, module: str, name: str):
        self.module = module
        self.name = name

    def __call__(self, *args, **kwargs):
        if self.name == "Size":
            return tuple(args[0]) if args else ()
        return {"__torch_class__": f"{self.module}.{self.name}",
                "args": args, "kwargs": kwargs}


def _np_reconstruct(subtype, shape, dtype):
    return np.ndarray.__new__(subtype, shape, dtype)


def _np_scalar(dt, payload):
    return np.frombuffer(payload, dtype=dt)[0]


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("numpy.core.multiarray", "_reconstruct"): _np_reconstruct,
    ("numpy._core.multiarray", "_reconstruct"): _np_reconstruct,
    ("numpy.core.multiarray", "scalar"): _np_scalar,
    ("numpy._core.multiarray", "scalar"): _np_scalar,
    ("numpy", "dtype"): np.dtype,
    ("numpy", "ndarray"): np.ndarray,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
}


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickler constrained to the globals a torch checkpoint references."""

    def __init__(self, file, storage_loader):
        super().__init__(file, encoding="latin1")
        self._storage_loader = storage_loader

    def find_class(self, module, name):
        key = (module, name)
        if key in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[key]
        if module == "torch" or module.startswith("torch."):
            return _TorchClassStub(module, name)
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (not in torch-ckpt allowlist)")

    def persistent_load(self, pid):
        # zip format: ('storage', storage_type, key, location, numel)
        # legacy:     ('storage', storage_type, root_key, location, numel,
        #              view_metadata)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        _, storage_type, key, _location, numel = pid[:5]
        return self._storage_loader(storage_type, str(key), int(numel))


def _storage_dtype(storage_type) -> Tuple[np.dtype, bool]:
    name = getattr(storage_type, "name", None) or str(storage_type)
    short = name.rsplit(".", 1)[-1]
    if short in _STORAGE_DTYPES:
        return _STORAGE_DTYPES[short], short == "BFloat16Storage"
    raise ValueError(f"unsupported torch storage type: {name}")


def _materialize(obj: Any, buffers: Dict[str, bytes]) -> Any:
    if isinstance(obj, _LazyTensor):
        return obj.materialize(buffers)
    if isinstance(obj, (dict, OrderedDict)):
        return type(obj)((k, _materialize(v, buffers)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v, buffers) for v in obj)
    return obj


def load(path_or_file: Union[str, BinaryIO]) -> Any:
    """Load a torch checkpoint → plain Python containers + NumPy arrays.

    Equivalent to ``torch.load(path, map_location='cpu')`` for data-only
    checkpoints (state dicts + metadata), both zip and legacy formats.
    """
    if isinstance(path_or_file, (str, bytes)):
        with open(path_or_file, "rb") as f:
            data = f.read()
    else:
        data = path_or_file.read()

    if zipfile.is_zipfile(io.BytesIO(data)):
        return _load_zip(data)
    return _load_legacy(data)


def _load_zip(data: bytes) -> Any:
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
    prefix = pkl_name[: -len("data.pkl")]

    buffers: Dict[str, bytes] = {}

    def storage_loader(storage_type, key, numel):
        dtype, is_bf16 = _storage_dtype(storage_type)
        buffers[key] = zf.read(f"{prefix}data/{key}")
        return _StoragePlaceholder(key, dtype, numel, is_bf16)

    obj = _RestrictedUnpickler(io.BytesIO(zf.read(pkl_name)), storage_loader).load()
    return _materialize(obj, buffers)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _load_legacy(data: bytes) -> Any:
    f = io.BytesIO(data)

    def unpickle_one(storage_loader=lambda *a: None):
        return _RestrictedUnpickler(f, storage_loader).load()

    magic = unpickle_one()
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a torch checkpoint (bad magic)")
    unpickle_one()  # protocol version
    unpickle_one()  # sys info

    placeholders: Dict[str, _StoragePlaceholder] = {}

    def storage_loader(storage_type, key, numel):
        dtype, is_bf16 = _storage_dtype(storage_type)
        ph = _StoragePlaceholder(key, dtype, numel, is_bf16)
        placeholders[key] = ph
        return ph

    obj = _RestrictedUnpickler(f, storage_loader).load()
    deserialized_keys = unpickle_one()

    buffers: Dict[str, bytes] = {}
    for key in deserialized_keys:
        key = str(key)
        ph = placeholders[key]
        (numel,) = struct.unpack("<q", f.read(8))
        itemsize = 2 if ph.is_bf16 else ph.dtype.itemsize
        buffers[key] = f.read(numel * itemsize)
    return _materialize(obj, buffers)


# ---------------------------------------------------------------------------
# Writer (zip format)
# ---------------------------------------------------------------------------

_NP_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


class _TensorStub:
    __slots__ = ("key", "arr")

    def __init__(self, key: str, arr: np.ndarray):
        self.key = key
        self.arr = arr


class _PickleWriter:
    """Hand-rolled pickle (protocol 2) emitter covering exactly what a torch
    checkpoint needs: dict/list/tuple/str/int/float/bool/None plus tensor
    stubs (persistent storage ref fed through _rebuild_tensor_v2)."""

    def __init__(self):
        self.out = io.BytesIO()
        self.out.write(b"\x80\x02")  # PROTO 2

    def global_ref(self, module: str, name: str):
        self.out.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def put(self, o):
        w = self.out.write
        if o is None:
            w(b"N")
        elif o is True:
            w(b"\x88")
        elif o is False:
            w(b"\x89")
        elif isinstance(o, int):
            if 0 <= o < 256:
                w(b"K" + bytes([o]))
            elif -2**31 <= o < 2**31:
                w(b"J" + struct.pack("<i", o))
            else:
                data = o.to_bytes((o.bit_length() + 8) // 8, "little", signed=True)
                w(b"\x8a" + bytes([len(data)]) + data)
        elif isinstance(o, float):
            w(b"G" + struct.pack(">d", o))
        elif isinstance(o, str):
            b = o.encode("utf-8")
            w(b"X" + struct.pack("<I", len(b)) + b)
        elif isinstance(o, bytes):
            if len(o) < 256:
                w(b"C" + bytes([len(o)]) + o)
            else:
                w(b"B" + struct.pack("<I", len(o)) + o)
        elif isinstance(o, _TensorStub):
            self.put_tensor(o)
        elif isinstance(o, dict):
            w(b"}")
            if o:
                w(b"(")
                for k, v in o.items():
                    self.put(k)
                    self.put(v)
                w(b"u")  # SETITEMS
        elif isinstance(o, list):
            w(b"]")
            if o:
                w(b"(")
                for v in o:
                    self.put(v)
                w(b"e")  # APPENDS
        elif isinstance(o, tuple):
            if len(o) == 0:
                w(b")")
            else:
                w(b"(")
                for v in o:
                    self.put(v)
                w(b"t")
        else:
            raise TypeError(f"cannot pickle {type(o)} into a torch checkpoint")

    def put_persistent_storage(self, stub: _TensorStub):
        # persistent id tuple, then BINPERSID
        self.out.write(b"(")
        self.put("storage")
        self.global_ref("torch", _NP_TO_STORAGE[stub.arr.dtype])
        self.put(stub.key)
        self.put("cpu")
        self.put(int(stub.arr.size))
        self.out.write(b"t")
        self.out.write(b"Q")  # BINPERSID

    def put_tensor(self, stub: _TensorStub):
        arr = stub.arr
        stride = tuple(s // arr.itemsize for s in arr.strides)
        self.global_ref("torch._utils", "_rebuild_tensor_v2")
        self.out.write(b"(")  # MARK for the arg tuple
        self.put_persistent_storage(stub)
        self.put(0)                 # storage_offset
        self.put(tuple(arr.shape))  # size
        self.put(stride)            # stride
        self.put(False)             # requires_grad
        self.global_ref("collections", "OrderedDict")  # backward_hooks
        self.out.write(b")")        # empty arg tuple
        self.out.write(b"R")        # REDUCE → OrderedDict()
        self.out.write(b"t")        # close arg tuple
        self.out.write(b"R")        # REDUCE → tensor

    def finish(self) -> bytes:
        self.out.write(b".")
        return self.out.getvalue()


def save(obj: Any, path: str) -> None:
    """Write `obj` (nested dicts/lists/scalars/strings with NumPy arrays as
    tensors) as a torch zip-format checkpoint readable by ``torch.load``."""
    storages: Dict[str, np.ndarray] = {}
    counter = [0]

    def convert(o):
        if isinstance(o, np.ndarray):
            arr = np.ascontiguousarray(o)
            if arr.dtype not in _NP_TO_STORAGE:
                arr = arr.astype(np.float32)
            key = str(counter[0])
            counter[0] += 1
            storages[key] = arr
            return _TensorStub(key, arr)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.bool_,)):
            return bool(o)
        if isinstance(o, dict):
            return {k: convert(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return type(o)(convert(v) for v in o)
        return o

    converted = convert(obj)
    writer = _PickleWriter()
    writer.put(converted)
    pkl = writer.finish()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", pkl)
        for key, arr in storages.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())
        zf.writestr("archive/version", "3\n")
