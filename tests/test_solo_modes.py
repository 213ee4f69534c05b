"""STARsolo extended modes vs reference goldens: all UMI dedup types,
multimapper distribution matrices, MultiGeneUMI filtering, multi-feature
runs (GeneFull variants, SJ, Velocyto), CellReads.stats."""
import filecmp
import os
import subprocess

import pytest

from tests.conftest import DATA, GOLD

D3 = os.path.join(os.path.dirname(DATA), "solo3")
G3 = os.path.join(os.path.dirname(GOLD), "solo3")

COMMON = ["--genomeDir", os.path.join(G3, "idx"),
          "--readFilesIn", os.path.join(D3, "cdna.fastq"),
          os.path.join(D3, "bc.fastq"),
          "--soloType", "CB_UMI_Simple",
          "--soloCBwhitelist", os.path.join(D3, "wl.txt"),
          "--soloCBstart", "1", "--soloCBlen", "16",
          "--soloUMIstart", "17", "--soloUMIlen", "12",
          "--outSAMtype", "None", "--soloCellFilter", "TopCells", "8"]


def _diff_tree(a, b):
    out = []
    for root, _, files in os.walk(a):
        for fn in files:
            fa = os.path.join(root, fn)
            fb = os.path.join(b, os.path.relpath(fa, a))
            assert os.path.exists(fb), f"missing {fb}"
            with open(fa, "rb") as f1, open(fb, "rb") as f2:
                if f1.read() != f2.read():
                    out.append(os.path.relpath(fa, a))
    assert not out, f"differs: {out}"


def _run(tmp_path, extra, use_device=False):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(COMMON + extra + ["--outFileNamePrefix", prefix])
    align_reads(P, use_device=use_device)
    return prefix


@pytest.mark.parametrize("name,extra", [
    ("dedup", ["--soloUMIdedup", "NoDedup", "Exact", "1MM_All",
               "1MM_Directional", "1MM_CR", "1MM_Directional_UMItools"]),
    ("mm", ["--soloMultiMappers", "Uniform", "Rescue", "PropUnique", "EM",
            "--soloCellReadStats", "Standard"]),
    ("mgumi", ["--soloUMIfiltering", "MultiGeneUMI"]),
    ("mgumicr", ["--soloUMIfiltering", "MultiGeneUMI_CR",
                 "--soloUMIdedup", "1MM_CR"]),
])
def test_solo3_modes(tmp_path, name, extra, use_device):
    prefix = _run(tmp_path, extra, use_device=use_device)
    _diff_tree(os.path.join(G3, name, "Solo.out"), prefix + "Solo.out")


def test_solo_multifeature(tmp_path):
    """Gene + GeneFull[_ExonOverIntron/_Ex50pAS] + SJ + Velocyto + CellReads"""
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "solo_cdna.fastq"),
                    os.path.join(DATA, "solo_bc.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--soloType", "CB_UMI_Simple",
                    "--soloCBwhitelist", os.path.join(DATA, "solo_wl.txt"),
                    "--soloCBstart", "1", "--soloCBlen", "16",
                    "--soloUMIstart", "17", "--soloUMIlen", "12",
                    "--outSAMtype", "None",
                    "--soloFeatures", "Gene", "GeneFull",
                    "GeneFull_ExonOverIntron", "GeneFull_Ex50pAS", "SJ",
                    "Velocyto", "--soloCellReadStats", "Standard"])
    align_reads(P, use_device=False)
    _diff_tree(os.path.join(GOLD, "solo_feat", "Solo.out"), prefix + "Solo.out")


def test_solo_cell_filtering_runmode(tmp_path):
    """--runMode soloCellFiltering: re-filter a raw matrix (EmptyDrops_CR),
    incl. the reference's nCB off-by-one that drops the last-indexed cell"""
    from star_tpu.params import Parameters
    from star_tpu.run import main as star_main
    out = str(tmp_path) + "/out_"
    star_main(["--runMode", "soloCellFiltering",
               os.path.join(G3, "mgumi", "Solo.out", "Gene", "raw"), out,
               "--soloCellFilter", "EmptyDrops_CR", "8", "0.99", "10", "100",
               "400", "10", "0.01", "200", "0.01", "300",
               "--outFileNamePrefix", str(tmp_path) + "/log_"])
    for f in ["barcodes.tsv", "features.tsv", "matrix.mtx"]:
        with open(os.path.join(G3, "cellfilt", "out_" + f)) as a, \
             open(out + f) as b:
            assert a.read() == b.read(), f


def _bam_records(path):
    import gzip
    import struct
    data = gzip.decompress(open(path, "rb").read())
    lt = struct.unpack("<i", data[4:8])[0]
    off = 8 + lt
    nref = struct.unpack("<i", data[off:off + 4])[0]
    off += 4
    for _ in range(nref):
        ln = struct.unpack("<i", data[off:off + 4])[0]
        off += 4 + ln + 4
    out = []
    while off < len(data):
        bs = struct.unpack("<i", data[off:off + 4])[0]
        out.append(data[off + 4:off + 4 + bs])
        off += 4 + bs
    return out


def test_solo_bam_tags(tmp_path):
    """CR/CY/UR/UY/GX/GN at alignment time, CB/UB injected during the
    coordinate sort from Gene readInfo, gx/gn multi-gene lists"""
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    base = ["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
            "--readFilesIn", os.path.join(DATA, "solo_cdna.fastq"),
            os.path.join(DATA, "solo_bc.fastq"),
            "--soloType", "CB_UMI_Simple",
            "--soloCBwhitelist", os.path.join(DATA, "solo_wl.txt"),
            "--soloCBstart", "1", "--soloCBlen", "16",
            "--soloUMIstart", "17", "--soloUMIlen", "12"]
    P = Parameters(base + ["--outFileNamePrefix", prefix,
                           "--outSAMtype", "BAM", "SortedByCoordinate",
                           "--outSAMattributes", "NH", "HI", "AS", "nM", "CR",
                           "CY", "UR", "UY", "GX", "GN", "CB", "UB"])
    align_reads(P, use_device=False)
    g = os.path.join(GOLD, "solo_tags")
    assert _bam_records(prefix + "Aligned.sortedByCoord.out.bam") == \
        _bam_records(os.path.join(g, "Aligned.sortedByCoord.out.bam"))
    P = Parameters(base + ["--outFileNamePrefix", prefix + "un_",
                           "--outSAMtype", "BAM", "Unsorted",
                           "--outSAMunmapped", "Within",
                           "--outSAMattributes", "NH", "HI", "AS", "nM", "CR",
                           "CY", "UR", "UY", "GX", "GN", "gx", "gn"])
    align_reads(P, use_device=False)
    assert _bam_records(prefix + "un_Aligned.out.bam") == \
        _bam_records(os.path.join(g, "un_Aligned.out.bam"))


DC = os.path.join(os.path.dirname(DATA), "soloC")
GC = os.path.join(os.path.dirname(GOLD), "soloC")

COMPLEX = ["--genomeDir", os.path.join(G3, "idx"),
           "--readFilesIn", os.path.join(DC, "cdna.fastq"),
           os.path.join(DC, "bc.fastq"),
           "--soloType", "CB_UMI_Complex",
           "--soloCBwhitelist", os.path.join(DC, "wl1.txt"),
           os.path.join(DC, "wl2.txt"),
           "--soloCBposition", "0_0_2_-1", "3_1_3_8",
           "--soloUMIposition", "3_9_3_14",
           "--soloAdapterSequence", "GAGTGATTGCTT",
           "--outSAMtype", "None", "--soloCellFilter", "TopCells", "6"]


@pytest.mark.parametrize("name,wltype", [
    ("mm1", "1MM"), ("exact", "Exact"), ("ed2", "EditDist_2")])
def test_solo_complex(tmp_path, name, wltype):
    """CB_UMI_Complex byte-identical: anchored multi-segment barcodes,
    multi-length whitelists, adapter Hamming anchoring, global product
    index, EditDist_2 edited whitelists (SoloBarcode.cpp,
    SoloReadBarcode_getCBandUMI.cpp:331-426), incl. reference quirks
    (per-CB cbMatch reset under EditDist_2; umiL=0-at-ctor homopolymer)."""
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(COMPLEX + ["--soloCBmatchWLtype", wltype,
                              "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)
    _diff_tree(os.path.join(GC, name, "Solo.out"), prefix + "Solo.out")


def test_smartseq_counting_golden(tmp_path):
    """--soloType SmartSeq per-well counting (reference
    SoloFeature_countSmartSeq.cpp): matrices + stats byte-identical"""
    import os
    from tests.conftest import GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesManifest",
                    os.path.join(root, "tests", "data", "smartseq", "manifest.tsv"),
                    "--soloType", "SmartSeq",
                    "--soloUMIdedup", "Exact", "NoDedup",
                    "--soloStrand", "Unstranded", "--soloFeatures", "Gene",
                    "--soloCellFilter", "None", "--outSAMtype", "None",
                    "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)
    gold = os.path.join(root, "tests", "golden", "smartseq", "Solo.out")
    for rel in ("Barcodes.stats", "Gene/Features.stats", "Gene/Summary.csv",
                "Gene/raw/barcodes.tsv", "Gene/raw/features.tsv",
                "Gene/raw/umiDedup-Exact.mtx", "Gene/raw/umiDedup-NoDedup.mtx"):
        got = open(prefix + "Solo.out/" + rel).read()
        want = open(os.path.join(gold, rel)).read()
        assert got == want, rel


def test_cb_samtagout_golden(tmp_path):
    """--soloType CB_samTagOut: corrected CB tag at alignment time, no
    counting (reference SoloReadBarcode_getCBandUMI.cpp:311-328)"""
    import gzip
    import os
    import struct
    from tests.conftest import DATA, GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "solo_cdna.fastq"),
                    os.path.join(DATA, "solo_bc.fastq"),
                    "--soloType", "CB_samTagOut",
                    "--soloCBwhitelist", os.path.join(DATA, "solo_wl.txt"),
                    "--soloCBstart", "1", "--soloCBlen", "16",
                    "--soloUMIstart", "17", "--soloUMIlen", "12",
                    "--soloCBmatchWLtype", "1MM",
                    "--outSAMattributes", "NH", "HI", "AS", "nM", "CR", "CY", "CB",
                    "--outSAMtype", "BAM", "Unsorted",
                    "--outSAMunmapped", "Within",
                    "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)

    def body(p):
        d = gzip.open(p, "rb").read()
        lt = struct.unpack("<i", d[4:8])[0]
        off = 8 + lt
        nref = struct.unpack("<i", d[off:off + 4])[0]
        off += 4
        for _ in range(nref):
            ln = struct.unpack("<i", d[off:off + 4])[0]
            off += 4 + ln + 4
        return d[off:]

    assert body(prefix + "Aligned.out.bam") == body(
        os.path.join(GOLD, "cb_samtag", "Aligned.out.bam"))


def test_transcript3p_quant_golden(tmp_path):
    """--soloFeatures Transcript3p: 3'-distance-weighted EM quantification
    per cell cluster (reference SoloFeature_quantTranscript.cpp)"""
    import os
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s3 = os.path.join(root, "tests")
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(s3, "golden", "solo3", "idx"),
                    "--readFilesIn", os.path.join(s3, "data", "solo3", "cdna.fastq"),
                    os.path.join(s3, "data", "solo3", "bc.fastq"),
                    "--soloType", "CB_UMI_Simple",
                    "--soloCBwhitelist", os.path.join(s3, "data", "solo3", "wl.txt"),
                    "--soloCBstart", "1", "--soloCBlen", "16",
                    "--soloUMIstart", "17", "--soloUMIlen", "12",
                    "--soloFeatures", "Gene", "Transcript3p",
                    "--soloCellFilter", "None",
                    "--soloClusterCBfile",
                    os.path.join(s3, "data", "solo3", "clusters.tsv"),
                    "--outSAMtype", "None", "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)
    for f in ("matrix.mtx", "features.tsv",
              "transcriptEndDistanceDistribution.txt"):
        got = open(prefix + "Solo.out/Transcript3p/" + f).read()
        want = open(os.path.join(s3, "golden", "solo3", "tr3p", f)).read()
        assert got == want, f
