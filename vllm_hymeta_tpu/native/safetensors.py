"""ctypes binding for the C++ mmap safetensors reader (csrc/).

Zero-copy: tensors come back as numpy views into the mmap'd file — no
host-side copy before jax.device_put.  Falls back to the pure-Python
`safetensors` package when the native lib isn't built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_DTYPES = {
    "F64": (np.float64, 8), "F32": (np.float32, 4),
    "F16": (np.float16, 2), "BF16": (np.uint16, 2),  # bf16 via bit view
    "I64": (np.int64, 8), "I32": (np.int32, 4), "I16": (np.int16, 2),
    "I8": (np.int8, 1), "U8": (np.uint8, 1), "BOOL": (np.bool_, 1),
    "U16": (np.uint16, 2), "U32": (np.uint32, 4), "U64": (np.uint64, 8),
}


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "libsafetensors_reader.so")


def build(quiet: bool = True) -> bool:
    """Compile the native reader in-tree (g++)."""
    csrc = os.path.dirname(_lib_path())
    try:
        subprocess.run(["make", "-C", csrc],
                       check=True,
                       capture_output=quiet)
        return True
    except Exception:
        return False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        build()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_num_tensors.restype = ctypes.c_int
    lib.st_num_tensors.argtypes = [ctypes.c_void_p]
    lib.st_tensor_name.restype = ctypes.c_char_p
    lib.st_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.st_tensor_info.restype = ctypes.c_int
    lib.st_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long)]
    lib.st_data_ptr.restype = ctypes.c_void_p
    lib.st_data_ptr.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.st_close.argtypes = [ctypes.c_void_p]
    lib.st_last_error.restype = ctypes.c_char_p
    _LIB = lib
    return lib


class NativeSafetensors:
    """One mmap'd .safetensors shard."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native reader not built")
        self._lib = lib
        self._h = lib.st_open(path.encode())
        if not self._h:
            raise RuntimeError(
                f"st_open failed: {lib.st_last_error().decode()}")

    def keys(self):
        n = self._lib.st_num_tensors(self._h)
        return [self._lib.st_tensor_name(self._h, i).decode()
                for i in range(n)]

    def get(self, name: str) -> Tuple[np.ndarray, str]:
        """Returns (array view, safetensors dtype string).  BF16 comes back
        as a uint16 bit view; convert with `bf16_to_f32` or feed to jax
        via `jnp.asarray(view).view(jnp.bfloat16)`."""
        dtype_buf = ctypes.create_string_buffer(16)
        shape = (ctypes.c_long * 8)()
        ndim = ctypes.c_int()
        nbytes = ctypes.c_long()
        rc = self._lib.st_tensor_info(self._h, name.encode(), dtype_buf,
                                      shape, ctypes.byref(ndim),
                                      ctypes.byref(nbytes))
        if rc != 0:
            raise KeyError(name)
        st_dtype = dtype_buf.value.decode()
        np_dtype, _ = _DTYPES[st_dtype]
        ptr = self._lib.st_data_ptr(self._h, name.encode())
        if not ptr:
            raise RuntimeError(self._lib.st_last_error().decode())
        buf = (ctypes.c_char * int(nbytes.value)).from_address(ptr)
        arr = np.frombuffer(buf, dtype=np_dtype).reshape(
            tuple(shape[i] for i in range(ndim.value)))
        return arr, st_dtype

    def close(self):
        if self._h:
            self._lib.st_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def bf16_to_f32(bits: np.ndarray) -> np.ndarray:
    out = bits.astype(np.uint32) << 16
    return out.view(np.float32)


def available() -> bool:
    return _load_lib() is not None


def iter_tensors(path: str, bf16_as: str = "f32"
                 ) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, numpy array) from one shard, preferring the native
    reader.  Arrays are OWNED copies (safe after the shard closes); use
    NativeSafetensors directly for zero-copy device_put while the mapping
    is alive.  bf16_as: "f32" upconverts BF16; "ml_dtypes" keeps bf16
    (requires ml_dtypes)."""
    if available():
        with NativeSafetensors(path) as f:
            for name in f.keys():
                arr, st_dtype = f.get(name)
                if st_dtype == "BF16":
                    if bf16_as == "ml_dtypes":
                        import ml_dtypes
                        arr = np.array(arr).view(ml_dtypes.bfloat16)
                    else:
                        arr = bf16_to_f32(arr)  # copies
                else:
                    arr = np.array(arr)     # detach from the mmap
                yield name, arr
    else:  # fallback: python safetensors
        from safetensors import safe_open
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)
