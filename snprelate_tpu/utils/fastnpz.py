"""Fast .npz reads for checkpoint tiles.

``np.load`` on an uncompressed ``np.savez`` archive streams every byte
through ``zipfile.ZipExtFile`` (CRC32 + chunked copies) at ~130 MB/s —
15x slower than a raw ``.npy`` read on the same disk. Checkpoint tile
grids move tens of GB through that path during GRM artifact assembly
and crash-resume (the reference's analog is a plain fread of its GDS
fragments), so ``fast_npz_load`` seeks straight to each STORED member's
data and hands the raw file object to ``np.lib.format.read_array``
(which uses ``fromfile``). Compressed or otherwise unusual members fall
back to ``np.load`` semantics.
"""

from __future__ import annotations

import struct
import zipfile

import numpy as np

__all__ = ["fast_npz_load"]


def _stored_member_offset(f, info) -> int | None:
    """Data offset of a ZIP_STORED member, or None if the local header
    disagrees with the central directory (then use the safe path)."""
    f.seek(info.header_offset)
    hdr = f.read(30)
    if len(hdr) != 30 or hdr[:4] != b"PK\x03\x04":
        return None
    nlen, elen = struct.unpack("<HH", hdr[26:30])
    return info.header_offset + 30 + nlen + elen


def fast_npz_load(fn) -> dict:
    """Load every array of ``fn`` (a ``np.savez``/``np.savez_compressed``
    path) into a dict, bypassing zipfile's CRC/copy streaming for
    uncompressed members. Returns {name: ndarray}.

    Weakened guarantee vs ``np.load``: STORED members skip the CRC32
    check (torn writes are covered by the callers' atomic tmp+replace
    saves, bit-rot is not). A byte-count sanity check re-routes members
    whose parsed payload size disagrees with the zip directory through
    the normal CRC-verified zipfile path."""
    out = {}
    with open(fn, "rb") as f:
        with zipfile.ZipFile(f) as z:
            for info in z.infolist():
                name = info.filename
                key = name[:-4] if name.endswith(".npy") else name
                if (name.endswith(".npy")
                        and info.compress_type == zipfile.ZIP_STORED):
                    off = _stored_member_offset(f, info)
                    if off is not None:
                        f.seek(off)
                        try:
                            arr = np.lib.format.read_array(
                                f, allow_pickle=False)
                            if f.tell() - off != info.file_size:
                                raise ValueError(
                                    f"{fn}:{name}: payload size "
                                    f"{f.tell() - off} != zip directory "
                                    f"size {info.file_size} (corrupt?)")
                            out[key] = arr
                            continue
                        except ValueError:
                            pass  # pickled/odd member: safe path below
                with z.open(info) as m:
                    out[key] = np.lib.format.read_array(
                        m, allow_pickle=False)
    return out
