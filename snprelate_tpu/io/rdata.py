"""Minimal pure-Python reader for R serialization (.RData / .rds).

Used to load the reference golden-value fixtures
(``/root/reference/inst/unitTests/valid/Validate.*.RData``, written by
``inst/unitTests/test_rel.R:10-88``) and the bundled ``data/hapmap_geno.RData``
without an R installation.

Supports the XDR ("X\\n") format, serialization versions 2 and 3, with the
SEXP types R's ``save()`` emits for plain data objects: NULL, symbols,
pairlists, logical/integer/real/string vectors, generic vectors (lists),
CHARSXP, attributes, reference objects, and the ALTREP compact sequences /
wrappers introduced in R 3.5.

This is a reader only; we never need to write RData.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# SEXP type codes (R internals)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CLOSXP = 3
ENVSXP = 4
PROMSXP = 5
LANGSXP = 6
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
EXPRSXP = 20
RAWSXP = 24
S4SXP = 25

# pseudo-types used by the serialization format
REFSXP = 255
NILVALUE_SXP = 254
GLOBALENV_SXP = 253
UNBOUNDVALUE_SXP = 252
MISSINGARG_SXP = 251
BASENAMESPACE_SXP = 250
NAMESPACESXP = 249
PACKAGESXP = 248
PERSISTSXP = 247
EMPTYENV_SXP = 242
BASEENV_SXP = 241
ATTRLANGSXP = 240
ATTRLISTSXP = 239
ALTREP_SXP = 238

R_NA_INT = -2147483648  # INT_MIN is R's integer NA


@dataclass
class RObject:
    """An R object with attributes (e.g. a matrix: array + dim attr)."""

    value: Any
    attributes: dict[str, Any] = field(default_factory=dict)

    def __repr__(self) -> str:  # pragma: no cover
        return f"RObject({type(self.value).__name__}, attrs={list(self.attributes)})"


class RNull:
    """R NULL singleton."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self) -> str:  # pragma: no cover
        return "R_NULL"


def _decompress(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:3] == b"BZh":
        return bz2.decompress(data)
    if data[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(data)
    return data


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs: list[Any] = []

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"RData stream truncated at {self.pos}")
        self.pos += n
        return b

    def u8(self) -> int:
        return self.read(1)[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.read(4))[0]

    def f64(self) -> float:
        return struct.unpack(">d", self.read(8))[0]

    def length(self) -> int:
        n = self.i32()
        if n == -1:  # long vector: two 32-bit words
            hi = self.i32() & 0xFFFFFFFF
            lo = self.i32() & 0xFFFFFFFF
            return (hi << 32) | lo
        return n

    # ----- SEXP parsing -----

    def item(self) -> Any:
        flags = self.i32()
        sexptype = flags & 0xFF
        # levels = flags >> 12
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)
        is_obj = bool(flags & 0x100)

        if sexptype == NILVALUE_SXP or sexptype == NILSXP:
            return RNull()
        if sexptype in (GLOBALENV_SXP, EMPTYENV_SXP, BASEENV_SXP, UNBOUNDVALUE_SXP,
                        MISSINGARG_SXP, BASENAMESPACE_SXP):
            return RNull()
        if sexptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i32()
            return self.refs[idx - 1]
        if sexptype == SYMSXP:
            name = self.item()  # a CHARSXP
            self.refs.append(name)
            return name
        if sexptype == CHARSXP:
            n = self.i32()
            if n == -1:
                return None  # NA_character_
            return self.read(n).decode("utf-8", errors="replace")
        if sexptype in (LISTSXP, LANGSXP, ATTRLANGSXP, ATTRLISTSXP):
            # dotted-pair list; collect into a python list of (tag, value)
            pairs = []
            while True:
                attrs = self.item() if has_attr else None
                tag = self.item() if has_tag else None
                val = self.item()
                if attrs is not None and not isinstance(attrs, RNull):
                    val = RObject(val, _pairs_to_dict(attrs))
                pairs.append((tag, val))
                flags = self.i32()
                sexptype = flags & 0xFF
                if sexptype in (NILVALUE_SXP, NILSXP):
                    break
                if sexptype not in (LISTSXP, LANGSXP):
                    # next element is a non-pairlist tail
                    self.pos -= 4
                    pairs.append((None, self.item()))
                    break
                has_attr = bool(flags & 0x200)
                has_tag = bool(flags & 0x400)
            return pairs
        if sexptype == ALTREP_SXP:
            return self._altrep()

        # vector-like types below can carry attributes *after* the data
        value: Any
        if sexptype == LGLSXP:
            n = self.length()
            arr = np.frombuffer(self.read(4 * n), dtype=">i4").astype(np.int32)
            value = np.where(arr == R_NA_INT, -1, arr).astype(np.int8)  # NA -> -1
        elif sexptype == INTSXP:
            n = self.length()
            value = np.frombuffer(self.read(4 * n), dtype=">i4").astype(np.int32)
        elif sexptype == REALSXP:
            n = self.length()
            value = np.frombuffer(self.read(8 * n), dtype=">f8").astype(np.float64)
        elif sexptype == CPLXSXP:
            n = self.length()
            value = np.frombuffer(self.read(16 * n), dtype=">c16").astype(np.complex128)
        elif sexptype == RAWSXP:
            n = self.length()
            value = np.frombuffer(self.read(n), dtype=np.uint8)
        elif sexptype == STRSXP:
            n = self.length()
            value = [self.item() for _ in range(n)]
        elif sexptype == VECSXP or sexptype == EXPRSXP:
            n = self.length()
            value = [self.item() for _ in range(n)]
        elif sexptype == S4SXP:
            value = RNull()
        else:
            raise NotImplementedError(f"RData SEXP type {sexptype} not supported")

        if has_attr:
            attrs = _pairs_to_dict(self.item())
            return _apply_attrs(value, attrs, is_obj)
        return value

    def _altrep(self) -> Any:
        info = self.item()  # pairlist: (class symbol, package, sexptype)
        state = self.item()
        _attr = self.item()
        cls_name = info[0][1] if isinstance(info, list) else None
        # info is [(None, CHAR class), (None, CHAR package), (None, int type)]
        names = [v for _, v in info] if isinstance(info, list) else []
        cname = names[0] if names else None
        if cname == "compact_intseq":
            n, start, step = state
            return (np.arange(int(n)) * int(step) + int(start)).astype(np.int32)
        if cname == "compact_realseq":
            n, start, step = state
            return np.arange(int(n)) * float(step) + float(start)
        if cname in ("wrap_logical", "wrap_integer", "wrap_real", "wrap_string",
                     "wrap_complex", "wrap_raw"):
            # state is a pairlist (wrapped, metadata)
            if isinstance(state, list):
                return state[0][1]
            return state
        if cname == "deferred_string":
            # state: (values, format); realize by str() conversion
            vals = state[0][1] if isinstance(state, list) else state
            return [None if (isinstance(v, float) and np.isnan(v)) else _num_to_rstr(v)
                    for v in np.asarray(vals).tolist()]
        raise NotImplementedError(f"ALTREP class {cname or cls_name} not supported")


def _num_to_rstr(v: Any) -> str:
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _pairs_to_dict(pairs: Any) -> dict[str, Any]:
    d: dict[str, Any] = {}
    if isinstance(pairs, RNull) or pairs is None:
        return d
    for tag, val in pairs:
        key = tag if isinstance(tag, str) else repr(tag)
        d[key] = val
    return d


def _apply_attrs(value: Any, attrs: dict[str, Any], is_obj: bool) -> Any:
    dim = attrs.get("dim")
    if dim is not None and isinstance(value, np.ndarray):
        # R is column-major
        value = value.reshape(tuple(int(x) for x in np.asarray(dim)), order="F")
    names = attrs.get("names")
    if names is not None and isinstance(value, list):
        value = dict(zip(list(names), value))
    keep = {k: v for k, v in attrs.items() if k not in ("dim", "names")}
    if keep:
        return RObject(value, keep)
    return value


def parse_rdata(path: str) -> dict[str, Any]:
    """Parse an .RData workspace file -> dict of {variable name: value}.

    R matrices come back as numpy arrays in R's column-major layout already
    reshaped; R lists with names become dicts; NULL becomes RNull.
    """
    with open(path, "rb") as f:
        raw = _decompress(f.read())
    if raw[:5] not in (b"RDX2\n", b"RDX3\n", b"RDA2\n", b"RDA3\n"):
        raise ValueError(f"not an RData file: {raw[:5]!r}")
    r = _Reader(raw[5:])
    fmt = r.read(2)
    if fmt != b"X\n":
        raise NotImplementedError(f"only XDR RData supported, got {fmt!r}")
    version = r.i32()
    r.i32()  # writer version
    r.i32()  # min reader version
    if version >= 3:
        n = r.i32()
        r.read(n)  # native encoding name
    top = r.item()
    out: dict[str, Any] = {}
    if isinstance(top, list):
        for tag, val in top:
            out[tag if isinstance(tag, str) else repr(tag)] = val
    return out


def parse_rds(path: str) -> Any:
    """Parse a .rds file (single serialized object)."""
    with open(path, "rb") as f:
        raw = _decompress(f.read())
    r = _Reader(raw)
    fmt = r.read(2)
    if fmt != b"X\n":
        raise NotImplementedError(f"only XDR rds supported, got {fmt!r}")
    version = r.i32()
    r.i32()
    r.i32()
    if version >= 3:
        n = r.i32()
        r.read(n)
    return r.item()
