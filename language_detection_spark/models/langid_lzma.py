"""Pure-Python reader for the reference's ``langid.lzma`` model artifact.

The artifact (ref ``Model.java:155-212``) is a standard ``.lzma`` stream —
5-byte properties + 8-byte little-endian uncompressed size + raw LZMA
data, exactly Python's ``lzma.FORMAT_ALONE`` — whose payload is a Java
Object Serialization stream of five arrays (ref ``Model.java:88-105``
``readExternal``/``writeExternal``):

    String[] langClasses; float[] nb_ptc; float[] nb_pc;
    short[] dsa; int[][] dsaOutput;

This module implements the tiny subset of the Java serialization grammar
those five objects need (TC_ARRAY / TC_CLASSDESC / TC_REFERENCE /
TC_STRING / TC_NULL), so the npz model can be regenerated without a JDK:

    python tools/gen_langid_npz.py  # round-trips vs data/langid_model.npz

Grammar reference: the Java Object Serialization Stream Protocol spec
(public Oracle documentation), not any JDK source.
"""

from __future__ import annotations

import lzma
import struct
from pathlib import Path

import numpy as np

# stream constants from the Java Object Serialization Stream Protocol
_MAGIC = 0xACED
_VERSION = 5
TC_NULL = 0x70
TC_REFERENCE = 0x71
TC_CLASSDESC = 0x72
TC_STRING = 0x74
TC_ARRAY = 0x75
TC_ENDBLOCKDATA = 0x78
_BASE_WIRE_HANDLE = 0x7E0000


class _JavaStream:
    """Cursor over a serialized stream, with the wire-handle table."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.handles: list[object] = []
        magic, version = self._unpack(">HH")
        if magic != _MAGIC or version != _VERSION:
            raise ValueError(f"not a Java serialization stream: {magic:#x}")

    def _unpack(self, fmt: str):
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals

    def u1(self) -> int:
        return self._unpack(">B")[0]

    def u2(self) -> int:
        return self._unpack(">H")[0]

    def i4(self) -> int:
        return self._unpack(">i")[0]

    def utf(self) -> str:
        n = self.u2()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def new_handle(self, obj) -> int:
        self.handles.append(obj)
        return _BASE_WIRE_HANDLE + len(self.handles) - 1

    def ref(self) -> object:
        return self.handles[self.i4() - _BASE_WIRE_HANDLE]

    # ------------------------------------------------------------------
    def class_desc(self) -> str:
        """Returns the class name; registers a handle for the descriptor."""
        tc = self.u1()
        if tc == TC_REFERENCE:
            return self.ref()  # type: ignore[return-value]
        if tc == TC_NULL:
            return ""
        if tc != TC_CLASSDESC:
            raise ValueError(f"unsupported classDesc token {tc:#x} at {self.pos}")
        name = self.utf()
        self._unpack(">q")  # serialVersionUID
        self.new_handle(name)
        self.u1()  # flags (SC_SERIALIZABLE for arrays)
        n_fields = self.u2()
        if n_fields:
            raise ValueError("array classDesc with fields — unsupported stream")
        if self.u1() != TC_ENDBLOCKDATA:
            raise ValueError("expected empty class annotation")
        self.class_desc()  # superclass (TC_NULL for arrays)
        return name

    def read_object(self):
        tc = self.u1()
        if tc == TC_NULL:
            return None
        if tc == TC_REFERENCE:
            return self.ref()
        if tc == TC_STRING:
            s = self.utf()
            self.new_handle(s)
            return s
        if tc == TC_ARRAY:
            name = self.class_desc()
            # handle is assigned BEFORE array contents are read
            arr_slot = len(self.handles)
            self.handles.append(None)
            n = self.i4()
            if name == "[F":
                out = np.frombuffer(
                    self.buf, dtype=">f4", count=n, offset=self.pos
                ).astype(np.float32)
                self.pos += 4 * n
            elif name == "[S":
                out = np.frombuffer(
                    self.buf, dtype=">i2", count=n, offset=self.pos
                ).astype(np.int16)
                self.pos += 2 * n
            elif name == "[I":
                out = np.frombuffer(
                    self.buf, dtype=">i4", count=n, offset=self.pos
                ).astype(np.int32)
                self.pos += 4 * n
            elif name in ("[Ljava.lang.String;", "[[I"):
                out = [self.read_object() for _ in range(n)]
            else:
                raise ValueError(f"unsupported array class {name!r}")
            self.handles[arr_slot] = out
            return out
        raise ValueError(f"unsupported token {tc:#x} at {self.pos}")


def read_model_arrays(path: str | Path):
    """langid.lzma → (langs, nb_ptc, nb_pc, dsa, dsa_output) raw arrays,
    matching Model.readExternal field-for-field."""
    raw = Path(path).read_bytes()
    payload = lzma.decompress(raw, format=lzma.FORMAT_ALONE)
    s = _JavaStream(payload)
    langs = s.read_object()
    nb_ptc = s.read_object()
    nb_pc = s.read_object()
    dsa = s.read_object()
    dsa_output = s.read_object()
    return langs, nb_ptc, nb_pc, dsa, dsa_output


def load_model(path: str | Path):
    """langid.lzma → LangIdModel (no JDK involved)."""
    from ..operators.langid_v3 import LangIdModel

    langs, nb_ptc, nb_pc, dsa, dsa_output = read_model_arrays(path)
    n_states = len(dsa_output)
    out_off = np.zeros(n_states, dtype=np.int64)
    out_len = np.zeros(n_states, dtype=np.int32)
    vals: list[np.ndarray] = []
    total = 0
    for i, arr in enumerate(dsa_output):
        if arr is None or len(arr) == 0:
            continue
        out_off[i] = total
        out_len[i] = len(arr)
        vals.append(np.asarray(arr, dtype=np.int32))
        total += len(arr)
    out_val = np.concatenate(vals) if vals else np.empty(0, np.int32)
    return LangIdModel(
        list(langs),
        nb_ptc,
        nb_pc,
        dsa.astype(np.int32),
        out_off,
        out_len,
        out_val,
    )
