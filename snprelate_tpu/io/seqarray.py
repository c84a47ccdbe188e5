"""SeqArray-format GDS support — the analog of the reference's second
genotype source ``CdSeqWorkSpace`` (dGenGWAS.h:190-226, dGenGWAS.cpp:829-975),
which dispatches into the SeqArray package so the same kernels run on
sequencing GDS files.

Instead of runtime dispatch into an external package, this module reads the
SEQ_ARRAY container directly (same CoreArray parser as ``gds.py``) and
collapses the per-haplotype allele indices to the reference-allele dosage
the kernels consume: genotype = # of REF alleles (0,1,2), 3 = missing when
any haplotype call is missing (SeqArray's ``$dosage`` convention used by
``CdSeqWorkSpace``).

Format notes (SeqArray data layout):
- root attr ``FileFormat == "SEQ_ARRAY"``; nodes ``sample.id``,
  ``variant.id``, ``position``, ``chromosome``, ``allele`` (comma-separated,
  REF first), folder ``genotype`` with:
  - ``data``: dBit2 allele indices, C-order dims (slots, n_sample, ploidy)
    (R prints the column-major reverse);
  - ``@data``: dUInt8 per variant — number of 2-bit layers (slots) the
    variant occupies (1 for <=3 alleles; extra layers extend the index 2
    bits at a time);
  - missing = all layers set to 3 (the maximum representable index).
- ``annotation/id`` maps to snp.rs.id; ``sample.annotation`` to sample
  annotations.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from .gds import open_gds
from .store import SNPData, pack2bit


def _read_opt(root, path):
    try:
        v = root.index(path).read()
    except KeyError:
        return None
    return np.asarray(v, dtype=object) if isinstance(v, list) else np.asarray(v)


def _dosage_from_calls(calls: np.ndarray, layers: np.ndarray) -> np.ndarray:
    """Collapse 2-bit allele-index layers to REF dosage per variant.

    ``calls``: (slots, n_samp, ploidy) values 0..3; ``layers``: per-variant
    layer counts. Allele index = sum_k layer_k << (2k); missing = the
    all-ones index; dosage = # of calls with index 0, 3 if any call missing.
    """
    n_var = len(layers)
    _slots, n_samp, _ploidy = calls.shape
    starts = np.concatenate([[0], np.cumsum(layers)])
    if starts[-1] > calls.shape[0]:
        raise ValueError(f"genotype/@data wants {starts[-1]} slots, "
                         f"data has {calls.shape[0]}")
    geno = np.empty((n_var, n_samp), np.uint8)
    max_l = int(layers.max()) if n_var else 1
    for nl in range(1, max_l + 1):
        sel = np.where(layers == nl)[0]
        if len(sel) == 0:
            continue
        base = starts[sel]
        idx = np.zeros((len(sel), n_samp, calls.shape[2]), np.int32)
        for k in range(nl):
            idx |= calls[base + k].astype(np.int32) << (2 * k)
        miss_val = (1 << (2 * nl)) - 1
        any_miss = (idx == miss_val).any(axis=2)
        dosage = (idx == 0).sum(axis=2).astype(np.uint8)
        geno[sel] = np.where(any_miss, 3, np.minimum(dosage, 2))
    return geno


def open_seq_gds(path: str) -> SNPData:
    """Open a SeqArray GDS file as a SNPData (REF-allele dosage matrix)."""
    f = open_gds(path)
    root = f.root
    if root.attributes.get("FileFormat") != "SEQ_ARRAY":
        raise ValueError(f"{path}: FileFormat is not SEQ_ARRAY")

    sample_id = np.asarray(root.index("sample.id").read(), dtype=object)
    variant_id = np.asarray(root.index("variant.id").read())
    n_samp = len(sample_id)
    n_var = len(variant_id)

    gnode = root.index("genotype").children["data"]
    calls = gnode.read()  # C-order (slots, n_samp, ploidy), values 0..3
    if calls.ndim != 3:
        raise ValueError(f"{path}: genotype/data has dims {calls.shape}")
    slots, gs_samp, ploidy = calls.shape
    if gs_samp != n_samp:
        raise ValueError(f"{path}: genotype/data sample dim {gs_samp} != "
                         f"{n_samp}")

    layers = _read_opt(root, "genotype/@data")
    if layers is None:
        layers = np.ones(n_var, np.uint8)
    layers = np.asarray(layers[:n_var], np.int64)
    geno = _dosage_from_calls(calls, layers)

    allele = _read_opt(root, "allele")
    if allele is not None:
        # "REF,ALT1,ALT2" -> "REF/ALT1,ALT2" (seqGDS2SNP convention)
        allele = np.asarray([str(a).replace(",", "/", 1) for a in allele],
                            dtype=object)

    annot: dict[str, Any] = {}
    if "sample.annotation" in root.children:
        for c in root.index("sample.annotation").children.values():
            v = c.read()
            annot[c.name] = (np.asarray(v, dtype=object)
                             if isinstance(v, list) else np.asarray(v))

    rs = _read_opt(root, "annotation/id")
    return SNPData(
        sample_id=sample_id, snp_id=variant_id,
        genotype_packed=pack2bit(geno), n_samp=n_samp,
        snp_position=np.asarray(root.index("position").read()),
        snp_chromosome=np.asarray(root.index("chromosome").read(),
                                  dtype=object),
        snp_allele=allele, snp_rs_id=rs, sample_annot=annot)


def write_seq_gds(data: SNPData, path: str) -> None:
    """Write a SNPData as a biallelic SEQ_ARRAY GDS file (diploid allele
    calls reconstructed from dosage: 2 -> (0,0), 1 -> (0,1), 0 -> (1,1),
    missing -> (3,3)). Round-trips through :func:`open_seq_gds`."""
    import struct

    from .gds import (GDSWriter, _folder_node, _leaf_node, _vstr_data, _zip)

    dense = data.geno()  # (n_snp, n_samp), dosage of REF
    n_snp, n_samp = dense.shape
    first = np.where(dense == 3, 3, (dense < 1).astype(np.uint8)
                     ).astype(np.uint8)
    second = np.where(dense == 3, 3, (dense < 2).astype(np.uint8)
                      ).astype(np.uint8)
    calls = np.stack([first, second], axis=2)  # C-order (slots, n_samp, 2)

    flat = calls.reshape(-1)
    pad = (-len(flat)) % 4
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
    q = flat.reshape(-1, 4)
    packed = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
              | (q[:, 3] << 6)).astype(np.uint8)

    w = GDSWriter()
    root_id = w.reserve()
    children = []

    def leaf(name, classname, arr_bytes, dims, attrs=None):
        node_id = w.reserve()
        stored = _zip(arr_bytes)
        data_id = w.add_block(stored)
        w.set_block(node_id, _leaf_node(classname, dims, data_id,
                                        attrs or {}, "ZIP",
                                        len(arr_bytes), len(stored)))
        children.append((name, node_id, 0))
        return node_id

    def auto(name, values):
        values = np.asarray(values)
        if np.issubdtype(values.dtype, np.integer):
            leaf(name, "dInt32", values.astype("<i4").tobytes(),
                 (len(values),))
        else:
            leaf(name, "dVStr8", _vstr_data(values), (len(values),))

    auto("sample.id", data.sample_id)
    auto("variant.id", data.snp_id)
    auto("position", np.asarray(data.snp_position, np.int32))
    auto("chromosome", np.asarray(data.snp_chromosome).astype(str))
    if data.snp_allele is not None:
        auto("allele", [str(a).replace("/", ",", 1) for a in data.snp_allele])
    else:
        auto("allele", ["A,B"] * n_snp)

    # genotype folder: data (bit2, C dims (slots, n_samp, 2)) + @data
    geno_children = []
    gd_id = w.reserve()
    gd_data = w.add_block(packed.tobytes())
    w.set_block(gd_id, _leaf_node("dBit2", (n_snp, n_samp, 2), gd_data, {}))
    geno_children.append(("data", gd_id, 0))
    ld_id = w.reserve()
    ld_stored = _zip(np.ones(n_snp, np.uint8).tobytes())
    ld_data = w.add_block(ld_stored)
    w.set_block(ld_id, _leaf_node("dUInt8", (n_snp,), ld_data, {}, "ZIP",
                                  n_snp, len(ld_stored)))
    geno_children.append(("@data", ld_id, 0))
    gfolder = w.add_block(_folder_node(geno_children, {}))
    children.append(("genotype", gfolder, 2))

    if data.snp_rs_id is not None:
        ann_children = []
        rs_id = w.reserve()
        rs_bytes = _vstr_data(data.snp_rs_id)
        rs_stored = _zip(rs_bytes)
        rs_data = w.add_block(rs_stored)
        w.set_block(rs_id, _leaf_node("dVStr8", (n_snp,), rs_data, {},
                                      "ZIP", len(rs_bytes), len(rs_stored)))
        ann_children.append(("id", rs_id, 0))
        afolder = w.add_block(_folder_node(ann_children, {}))
        children.append(("annotation", afolder, 2))

    w.set_block(root_id, _folder_node(children,
                                      {"FileFormat": "SEQ_ARRAY",
                                       "FileVersion": "v1.0"}))
    w.write(path, entry_id=root_id)
