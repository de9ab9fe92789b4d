"""IO tests: GTF annotation (own fixtures — behavioral contract mirrors
reference tests/test_io.py) and the standalone RData reader."""

import gzip
import struct

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import infercnvpy_tpu as cnv
from infercnvpy_tpu.io._genepos import genomic_position_from_gtf, read_gtf
from infercnvpy_tpu.io._rdata import read_rdata, read_rds


# ---------------------------------------------------------------------------
# GTF
# ---------------------------------------------------------------------------


def _adata_for(genes, ids=None):
    X = np.ones((3, len(genes)), dtype=np.float32)
    var = pd.DataFrame(index=pd.Index(genes))
    if ids is not None:
        var["gene_ids"] = ids
    return cnv.AnnData(X=X, var=var)


def test_read_gtf(testdata):
    gtf = read_gtf(testdata / "mini.gtf", features={"gene"})
    assert len(gtf) == 6  # exon line filtered out
    assert set(gtf["seqname"]) == {"chr21", "chr22"}
    assert "GENEA" in set(gtf["gene_name"])


def test_genomic_position_from_gtf_by_name(testdata):
    adata = _adata_for(["GENEA", "GENEB", "GENEC", "GENED", "MISSING"])
    genomic_position_from_gtf(testdata / "mini.gtf", adata)
    assert all(adata.var["chromosome"].dropna().str.startswith("chr"))
    npt.assert_array_equal(adata.var["start"].isnull().values, adata.var["end"].isnull().values)
    assert int((~adata.var["start"].isnull()).sum()) == 4
    assert adata.var.loc["GENEA", "chromosome"] == "chr21"
    assert adata.var.loc["GENEA", "start"] == 5010000


def test_genomic_position_from_gtf_by_id(testdata):
    adata = _adata_for(
        ["a", "b", "c"],
        ids=["ENSG00000001", "ENSG00000004", "ENSG00000099"],
    )
    genomic_position_from_gtf(testdata / "mini.gtf", adata, adata_gene_id="gene_ids", gtf_gene_id="gene_id")
    # version suffixes stripped: ENSG00000001.5 matches ENSG00000001
    assert int((~adata.var["start"].isnull()).sum()) == 2


def test_genomic_position_gtf_drops_duplicates(testdata):
    adata = _adata_for(["DUPGENE", "GENEA"])
    genomic_position_from_gtf(testdata / "mini.gtf", adata)
    # DUPGENE appears twice in the GTF -> dropped (keep=False)
    assert adata.var["start"].isnull().loc["DUPGENE"]
    assert not adata.var["start"].isnull().loc["GENEA"]


def test_genomic_position_gtf_adds_chr_prefix(testdata):
    adata = _adata_for(["EGENE1", "EGENE2"])
    genomic_position_from_gtf(testdata / "mini_ensembl.gtf", adata)
    assert all(adata.var["chromosome"].dropna().str.startswith("chr"))
    assert adata.var.loc["EGENE1", "chromosome"] == "chr1"


def test_gtf_then_infercnv(testdata):
    """Annotated genes feed straight into infercnv (reference: test_io.py:28)."""
    rng = np.random.default_rng(0)
    genes = ["GENEA", "GENEB", "GENEC", "GENED"]
    adata = cnv.AnnData(X=rng.random((8, 4)).astype(np.float32), var=pd.DataFrame(index=pd.Index(genes)))
    genomic_position_from_gtf(testdata / "mini.gtf", adata)
    cnv.tl.infercnv(adata, window_size=2, step=1)
    assert "X_cnv" in adata.obsm


# ---------------------------------------------------------------------------
# RData reader (hand-crafted XDR v2 streams — the format R `save()` writes)
# ---------------------------------------------------------------------------


def _w_int(v):
    return struct.pack(">i", v)


def _w_flags(ptype, has_attr=False, has_tag=False):
    f = ptype
    if has_attr:
        f |= 0x200
    if has_tag:
        f |= 0x400
    return _w_int(f)


def _w_chars(s: str):
    b = s.encode()
    return _w_flags(9) + _w_int(len(b)) + b  # CHARSXP


def _w_sym(s: str):
    return _w_flags(1) + _w_chars(s)  # SYMSXP


def _w_strvec(values):
    out = _w_flags(16) + _w_int(len(values))
    for v in values:
        out += _w_chars(v)
    return out


def _w_realvec(values, attrs=b""):
    out = _w_flags(14, has_attr=bool(attrs)) + _w_int(len(values))
    for v in values:
        out += struct.pack(">d", float(v))
    return out + attrs


def _w_intvec(values, attrs=b""):
    out = _w_flags(13, has_attr=bool(attrs)) + _w_int(len(values))
    for v in values:
        out += _w_int(int(v))
    return out + attrs


def _w_nil():
    return _w_flags(254)


def _w_pairlist(items):
    """items: list of (name, payload_bytes)."""
    out = b""
    for name, payload in items:
        out = out  # build left-to-right below
    def rec(idx):
        if idx == len(items):
            return _w_nil()
        name, payload = items[idx]
        return _w_flags(2, has_tag=True) + _w_sym(name) + payload + rec(idx + 1)
    return rec(0)


def _rdata_bytes(bindings):
    body = b"RDX2\nX\n" + _w_int(2) + _w_int(0x030000) + _w_int(0x020300)
    body += _w_pairlist(bindings)
    return gzip.compress(body)


def test_read_rdata_matrix_with_dimnames(tmp_path):
    # 2x3 real matrix, column-major, with dimnames
    dimnames = _w_flags(19) + _w_int(2) + _w_strvec(["r1", "r2"]) + _w_strvec(["c1", "c2", "c3"])
    attrs = _w_pairlist(
        [
            ("dim", _w_intvec([2, 3])),
            ("dimnames", dimnames),
        ]
    )
    mat = _w_realvec([1, 2, 3, 4, 5, 6], attrs=attrs)
    path = tmp_path / "m.RData"
    path.write_bytes(_rdata_bytes([("CNA_mtx_relat", mat)]))
    res = read_rdata(path)
    df = res["CNA_mtx_relat"]
    assert list(df.index) == ["r1", "r2"]
    assert list(df.columns) == ["c1", "c2", "c3"]
    npt.assert_allclose(df.values, np.array([[1, 3, 5], [2, 4, 6]], dtype=float))


def test_read_rdata_dataframe(tmp_path):
    cls = _w_strvec(["data.frame"])
    rownames = _w_intvec([-2147483648, -3])  # compact row.names [NA, -n]
    attrs = _w_pairlist(
        [
            ("names", _w_strvec(["seqnames", "gene"])),
            ("row.names", rownames),
            ("class", cls),
        ]
    )
    df_payload = _w_flags(19, has_attr=True) + _w_int(2) + _w_realvec([1, 1, 2]) + _w_strvec(["a", "b", "c"]) + attrs
    path = tmp_path / "anno.RData"
    path.write_bytes(_rdata_bytes([("count_mtx_annot", df_payload)]))
    res = read_rdata(path)
    df = res["count_mtx_annot"]
    assert list(df.columns) == ["seqnames", "gene"]
    npt.assert_allclose(df["seqnames"].values, [1, 1, 2])
    assert list(df["gene"]) == ["a", "b", "c"]


def test_read_rds_vector(tmp_path):
    body = b"X\n" + struct.pack(">i", 2) + struct.pack(">i", 0x030000) + struct.pack(">i", 0x020300)
    body += _w_realvec([3.5, -1.0])
    path = tmp_path / "v.rds"
    path.write_bytes(gzip.compress(body))
    v = read_rds(path)
    npt.assert_allclose(v, [3.5, -1.0])


def test_read_scevan(tmp_path):
    """End-to-end SCEVAN import through the own RData reader."""
    # CNA matrix: genes x cells (SCEVAN layout; read_scevan transposes)
    dimnames = _w_flags(19) + _w_int(2) + _w_strvec(["g1", "g2"]) + _w_strvec(["cell_1", "cell_2"])
    attrs = _w_pairlist([("dim", _w_intvec([2, 2])), ("dimnames", dimnames)])
    mat = _w_realvec([0.1, 0.2, -0.1, 0.3], attrs=attrs)
    (tmp_path / "s_CNAmtx.RData").write_bytes(_rdata_bytes([("CNA_mtx_relat", mat)]))

    cls = _w_strvec(["data.frame"])
    attrs2 = _w_pairlist(
        [
            ("names", _w_strvec(["seqnames", "gene_name"])),
            ("row.names", _w_intvec([-2147483648, -2])),
            ("class", cls),
        ]
    )
    anno = _w_flags(19, has_attr=True) + _w_int(2) + _w_realvec([1, 2]) + _w_strvec(["g1", "g2"]) + attrs2
    (tmp_path / "s_count_mtx_annot.RData").write_bytes(_rdata_bytes([("count_mtx_annot", anno)]))

    adata = cnv.AnnData(
        X=np.ones((3, 2), np.float32),
        obs=pd.DataFrame(index=["cell_1", "cell_2", "cell_3"]),
    )
    cnv.io.read_scevan(adata, tmp_path)
    assert adata.shape[0] == 2  # cell_3 filtered by SCEVAN
    assert adata.obsm["X_scevan"].shape == (2, 2)
    assert adata.uns["scevan"]["chr_pos"] == {"chr1": 0, "chr2": 1}


def test_biomart_cache_roundtrip(tmp_path, monkeypatch):
    """Cached Biomart queries are served from disk without network access
    (reference caches via scanpy's use_cache, io/_genepos.py:39-49)."""
    import pandas as pd

    from infercnvpy_tpu import settings
    from infercnvpy_tpu.io._genepos import fetch_biomart_annotations

    monkeypatch.setattr(settings, "datasetdir", tmp_path)

    calls = {"n": 0}
    payload = "ENSG1\t100\t200\t1\nENSG2\t300\t400\t2\n"

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            calls["n"] += 1
            return payload.encode()

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", lambda *a, **k: _Resp())

    attrs = ["ensembl_gene_id", "start_position", "end_position", "chromosome_name"]
    df1 = fetch_biomart_annotations("hsapiens", attrs)
    assert calls["n"] == 1
    df2 = fetch_biomart_annotations("hsapiens", attrs)
    assert calls["n"] == 1  # second call hit the cache
    pd.testing.assert_frame_equal(df1, df2)
    df3 = fetch_biomart_annotations("hsapiens", attrs, use_cache=False)
    assert calls["n"] == 2
    pd.testing.assert_frame_equal(df1, df3)
