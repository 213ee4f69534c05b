"""STARsolo orchestrator: barcode matching + multi-feature counting.

Reference behavior: source/SoloReadBarcode_getCBandUMI.cpp (CB extraction,
whitelist exact/1MM matching, UMI checks), source/Solo.cpp (feature loop,
Barcodes.stats, pseudocounts), source/ParametersSolo.cpp (readInfo/readIndex
wiring), source/SoloFeature_processRecords.cpp (per-feature driver).

This is the host implementation; the counting kernels (WL binary search, UMI
collapse via segmented sort) are batched on device in later rounds.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .annotate import (FEATURE_NAMES, FEATURE_DIRNAMES, FT_GENE, FT_GENEFULL,
                       FT_GENEFULL_EXONOVERINTRON, FT_GENEFULL_EX50PAS, FT_SJ,
                       FT_VELOCYTO, ReadAnnot, align_exon_overlap,
                       classify_align, gene_full_exon_over_intron,
                       gene_full_overlap)
from .collapse import DedupConf
from .feature import (GENEISH, SoloFeatureProc, SoloReadFeature, FEAT_STATS,
                      FLAG_NAMES, N_BITS, fmt_g)


def encode_bc(seq: str) -> Optional[Tuple[int, int]]:
    """(value, posN): posN=-1 no Ns, >=0 single N position, -2 multiple Ns"""
    v = 0
    pos_n = -1
    for i, c in enumerate(seq):
        v <<= 2
        if c == "A":
            pass
        elif c == "C":
            v += 1
        elif c == "G":
            v += 2
        elif c == "T":
            v += 3
        else:
            if pos_n >= 0:
                return v, -2
            pos_n = i
    return v, pos_n


class SoloBarcodes:
    """whitelist matching (reference SoloReadBarcode_getCBandUMI.cpp)"""

    def __init__(self, P):
        self.P = P
        self.cb_s = P.soloCBstart[0] - 1
        self.cb_l = P.soloCBlen[0]
        self.umi_s = P.soloUMIstart[0] - 1
        self.umi_l = P.soloUMIlen[0]
        self.wl_yes = P.soloCBwhitelist[0] not in ("-", "None")
        mm = P.soloCBmatchWLtype
        self.mm1 = mm.startswith("1MM")
        self.mm1_multi = "multi" in mm
        self.mm1_multi_pc = "pseudocounts" in mm
        self.mm1_nbase = "Nbase" in mm
        self.one_exact = mm in ("Exact", "1MM", "1MM_multi")
        if self.wl_yes:
            strs = []
            with open(P.soloCBwhitelist[0]) as f:
                for line in f:
                    s = line.strip()
                    if s:
                        strs.append(s)
            vals = np.array([encode_bc(s)[0] for s in strs], dtype=np.uint64)
            order = np.argsort(vals, kind="stable")
            self.wl = vals[order]
            self.wl_str = [strs[i] for i in order]
        else:
            self.wl = np.zeros(0, dtype=np.uint64)
            self.wl_str = []
        self.homopolymers = set()
        for b in range(4):
            v = 0
            for _ in range(self.umi_l):
                v = (v << 2) + b
            self.homopolymers.add(v)
        self.cb_read_count_exact = np.zeros(len(self.wl), dtype=np.int64)

    def _wl_find(self, v: int) -> int:
        i = int(np.searchsorted(self.wl, np.uint64(v)))
        if i < len(self.wl) and self.wl[i] == np.uint64(v):
            return i
        return -1

    def match(self, cb_seq: str, cb_qual: str):
        """returns (cbMatch, matchList); matchList entries are (wl_index, qual)"""
        v, pos_n = encode_bc(cb_seq)
        if not self.wl_yes:
            if pos_n != -1:
                return -2, []
            return 0, [(v, "")]
        if pos_n == -2:
            return -2, []
        if pos_n == -1:
            i = self._wl_find(v)
            if i >= 0:
                return 0, [(i, "")]
        if not self.mm1:
            return -1, []
        matches = []
        if pos_n >= 0:
            shift = 2 * (len(cb_seq) - 1 - pos_n)
            for jj in range(4):
                i = self._wl_find(v ^ (jj << shift))
                if i >= 0:
                    if matches and not self.mm1_nbase:
                        return -3, []
                    matches.append((i, cb_qual[pos_n]))
        else:
            for ii in range(len(cb_seq)):
                for jj in range(1, 4):
                    i = self._wl_find(v ^ (jj << (ii * 2)))
                    if i >= 0:
                        matches.append((i, cb_qual[len(cb_seq) - 1 - ii]))
        if not matches:
            return -1, []
        if len(matches) == 1:
            return 1, matches
        if not self.mm1_multi:
            return -3, []
        return len(matches), matches

    def get_cb_umi(self, b_seq: str, b_qual: str):
        """-> (cbMatch, matches, umi) or negative cbMatch on failure"""
        cb_seq = b_seq[self.cb_s:self.cb_s + self.cb_l]
        umi_seq = b_seq[self.umi_s:self.umi_s + self.umi_l]
        cb_qual = b_qual[self.cb_s:self.cb_s + self.cb_l]
        cb_match, matches = self.match(cb_seq, cb_qual)
        umi_v, umi_pos_n = encode_bc(umi_seq)
        if umi_pos_n != -1:
            return -23, [], 0
        if umi_v in self.homopolymers:
            return -24, [], 0
        if cb_match == 0:
            self.cb_read_count_exact[matches[0][0]] += 1
        return cb_match, matches, umi_v


def solo_cell_filtering(P):
    """--runMode soloCellFiltering <rawDir> <outPrefix>: re-filter a raw
    matrix without remapping (reference Solo.cpp:23-44 +
    SoloFeature_loadRawMatrix.cpp)."""
    import shutil
    from .feature import SoloFeatureProc, c_round
    if len(P.runMode) < 3:
        raise SystemExit(
            "Exiting because of fatal PARAMETER error: --runMode "
            "soloCellFiltering should contain paths to count matrix input "
            "directorry and output prefix.\nSOLUTION: re-run with --runMode "
            "soloCellFiltering </path/to/raw/count/dir/> </path/to/output/prefix>")
    input_prefix = P.runMode[1] + "/"
    out_prefix = P.runMode[2]

    if not os.path.exists(input_prefix + "matrix.mtx"):
        raise SystemExit(
            "EXITING because of fatal input ERROR: could not open input file "
            + input_prefix + "matrix.mtx" + "\nSOLUTION: check path and "
            "permission for the matrix file " + input_prefix + "matrix.mtx")
    entries = []  # (gene0, cell0, count)
    with open(input_prefix + "matrix.mtx") as f:
        for line in f:
            if line.startswith("%"):
                continue
            features_number, n_cb1, n_tot = (int(x) for x in line.split())
            break
        for line in f:
            p = line.split()
            entries.append((int(p[0]) - 1, int(p[1]) - 1,
                            c_round(float(p[2]))))
    if not entries:
        raise SystemExit("Exiting because of fatal INPUT FILE error: no "
                         "counts detected in " + input_prefix + "matrix.mtx"
                         + "\nSOLUTION: check the formatting of the matrix file.")
    entries.sort(key=lambda e: (e[1], e[0]))  # funCompareTypeSecondFirst

    proc = SoloFeatureProc.__new__(SoloFeatureProc)
    proc.ft = -1
    proc.P = P
    proc.features_number = features_number
    proc.conf = DedupConf(["1MM_All"], "-", ["Unique"], 1)
    proc.trm = None
    cells = sorted({e[1] for e in entries})
    cell_idx = {c: i for i, c in enumerate(cells)}
    # reference quirk: loadRawMatrix's second counting loop leaves nCB at
    # nCells-1 (SoloFeature_loadRawMatrix.cpp:110-119), so cellFiltering
    # silently drops the highest-indexed cell; arrays keep full length
    # (nUMIperCBsorted still includes it) — replicated for byte-identity
    proc.n_cb = len(cells) - 1
    proc.ind_cb = np.array(cells, dtype=np.int64)
    proc.ind_cb_wl = np.full(n_cb1, -1, dtype=np.int64)
    proc.ind_cb_wl[proc.ind_cb] = np.arange(len(cells))
    proc.rows_per_cb = [[] for _ in range(len(cells))]
    proc.n_umi_per_cb = np.zeros(len(cells), dtype=np.int64)
    proc.n_gene_per_cb = np.zeros(len(cells), dtype=np.int64)
    for (g, c, n) in entries:
        icb = cell_idx[c]
        proc.rows_per_cb[icb].append([g, n])
        proc.n_umi_per_cb[icb] += n
        proc.n_gene_per_cb[icb] += 1

    class _BC:
        pass
    proc.bc = _BC()
    with open(input_prefix + "barcodes.tsv") as f:
        proc.bc.wl_str = [l.rstrip("\n") for l in f][:n_cb1]

    os.makedirs(os.path.dirname(out_prefix + "x") or ".", exist_ok=True)
    shutil.copyfile(input_prefix + "features.tsv", out_prefix + "features.tsv")
    proc.count_mat_stride = 2  # [gene, count] rows; only iCol=1 is written
    proc.cell_filtering(P, out_prefix, None)


BAR_STATS = ["noNoAdapter", "noNoUMI", "noNoCB", "noNinCB", "noNinUMI",
             "noUMIhomopolymer", "noNoWLmatch", "noTooManyMM",
             "noTooManyWLmatches", "yesWLmatchExact", "yesOneWLmatchWithMM",
             "yesMultWLmatchWithMM"]


class Solo:
    """multi-feature STARsolo driver (reference Solo + SoloFeature)"""

    def __init__(self, gi, P, trm):
        self.gi = gi
        self.P = P
        self.trm = trm
        self.bc = SoloBarcodes(P)
        self.features = [FEATURE_NAMES[f] for f in P.soloFeatures]
        self.conf = DedupConf(P.soloUMIdedup, P.soloUMIfiltering[0],
                              P.soloMultiMappers, self.bc.umi_l)
        self.strand = {"Unstranded": -1, "Forward": 0, "Reverse": 1}[P.soloStrand]
        # readInfo/readIndex wiring (ParametersSolo.cpp:418-448,486-491)
        self.read_info_yes = {ft: False for ft in self.features}
        if FT_VELOCYTO in self.features:
            self.read_info_yes[FT_GENE] = True
        self.sam_attr_feature = self.features[0]
        if getattr(P, "outSAMattrCBUB", False):
            if self.sam_attr_feature not in (FT_GENE, FT_GENEFULL,
                                             FT_GENEFULL_EXONOVERINTRON,
                                             FT_GENEFULL_EX50PAS):
                raise SystemExit(
                    "EXITING because of fatal PARAMETERS error: CB and/or UB "
                    "attributes in --outSAMattributes require --soloFeatures "
                    "Gene OR/AND GeneFull OR/AND GeneFull_Ex50pAS.\nSOLUTION: "
                    "re-run STAR adding Gene AND/OR GeneFull OR/AND "
                    "GeneFull_Ex50pAS OR/AND GeneFull_ExonOverIntron to "
                    "--soloFeatures")
            self.read_info_yes[self.sam_attr_feature] = True
        read_stats_all = getattr(P, "soloCellReadStats", "None") == "Standard"
        self.read_stats_yes = {ft: (read_stats_all and ft not in (FT_SJ, FT_VELOCYTO))
                               for ft in self.features}
        read_index_yes = {ft: (self.read_info_yes[ft] or self.read_stats_yes[ft])
                          for ft in self.features}
        if self.conf.multi_yes:
            for ft in self.features:
                if ft in GENEISH:
                    read_index_yes[ft] = True
        self.recorders = {ft: SoloReadFeature(
            ft, P, len(self.bc.wl), read_index_yes[ft],
            self.read_stats_yes[ft], self.read_info_yes[ft])
            for ft in self.features}
        self.bar_stats = dict.fromkeys(BAR_STATS, 0)
        self.n_reads = 0
        self.q30_bc = [0, 0]
        self.q30_rna = [0, 0]
        self.need_gene_annot = any(ft in (FT_GENE, FT_GENEFULL_EXONOVERINTRON,
                                          FT_VELOCYTO) for ft in self.features)
        self.velocyto_yes = FT_VELOCYTO in self.features
        self.procs: Dict[int, SoloFeatureProc] = {}

    # -------------------------------------------------------------- mapping
    def add_read(self, res, b_seq: str, b_qual: str, i_read: int):
        self.n_reads += 1
        cb_match, matches, umi = self.bc.get_cb_umi(b_seq, b_qual)
        bc = self.bc
        # raw barcode attrs for SAM CR/CY/UR/UY (alignBAM ATTR_CR etc.)
        res.solo_bar = (b_seq[bc.cb_s:bc.cb_s + bc.cb_l],
                        b_qual[bc.cb_s:bc.cb_s + bc.cb_l],
                        b_seq[bc.umi_s:bc.umi_s + bc.umi_l],
                        b_qual[bc.umi_s:bc.umi_s + bc.umi_l])
        q = b_qual[bc.cb_s:bc.cb_s + bc.cb_l] + b_qual[bc.umi_s:bc.umi_s + bc.umi_l]
        self.q30_bc[1] += len(q)
        self.q30_bc[0] += sum(1 for c in q if ord(c) >= 33 + 30)
        for qs in res.quals:
            self.q30_rna[1] += len(qs)
            self.q30_rna[0] += sum(1 for c in qs if ord(c) >= 33 + 30)
        key = {0: "yesWLmatchExact", 1: "yesOneWLmatchWithMM",
               -1: "noNoWLmatch", -2: "noNinCB", -3: "noTooManyWLmatches",
               -11: "noNoCB", -12: "noTooManyMM", -23: "noNinUMI",
               -24: "noUMIhomopolymer"}.get(cb_match, "yesMultWLmatchWithMM")
        self.bar_stats[key] += 1

        n_tr = 0 if res.unmap_type >= 0 else res.n_tr
        annot = ReadAnnot()
        if n_tr > 0:
            if self.need_gene_annot:
                classify_align(self.trm, res.transcripts, n_tr, self.strand,
                               self.velocyto_yes, annot)
            if FT_GENEFULL in self.features:
                gene_full_overlap(self.trm, res.transcripts, n_tr,
                                  self.strand, annot)
            if FT_GENEFULL_EXONOVERINTRON in self.features:
                gene_full_exon_over_intron(self.trm, res.transcripts, n_tr,
                                           self.strand, annot)
            if FT_GENEFULL_EX50PAS in self.features:
                align_exon_overlap(self.trm, res.transcripts, n_tr,
                                   self.strand, annot)
        chr_names = None
        if n_tr > 0 and any(self.read_stats_yes.values()):
            gi = self.gi
            chr_names = [gi.chr_name[int(gi.chr_bin[res.transcripts[i].exons[0][1]
                                                    >> gi.chr_bin_nbits])]
                         for i in range(n_tr)]
        res.solo_falign = annot.falign.get(self.sam_attr_feature)
        res.solo_fset = annot.fset.get(self.sam_attr_feature)
        for ft in self.features:
            self.recorders[ft].record(annot, n_tr, res.transcripts, i_read,
                                      cb_match, matches, umi, chr_names)

    # ---------------------------------------------------------------- output
    def process(self, out_dir: str, run_stats: Dict[str, int],
                sj_all: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        P = self.P
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "Barcodes.stats"), "w") as f:
            f.write("".join(f"{k:>50}{v:>15}\n" for k, v in self.bar_stats.items()))
        if self.bc.mm1_multi_pc:
            self.bc.cb_read_count_exact += 1

        bar_inval = sum(self.bar_stats[k] for k in BAR_STATS[:9])
        for ft in self.features:
            proc = SoloFeatureProc(ft, P, self.conf, self.trm, self.bc,
                                   self.recorders[ft], self.read_info_yes[ft])
            self.procs[ft] = proc
            prefix = os.path.join(out_dir, FEATURE_DIRNAMES[ft]) + "/"
            os.makedirs(prefix, exist_ok=True)
            if ft == FT_SJ:
                proc.sj_all = sj_all
            proc.sum_threads()
            if ft == FT_VELOCYTO:
                proc.count_velocyto(self.procs[FT_GENE])
            else:
                proc.count_cb_gene_umi()
            with open(prefix + "Features.stats", "w") as f:
                f.write("".join(f"{k:>50}{v:>15}\n"
                                for k, v in proc.rf.stats.items()))
            proc.output_results(False, prefix + "raw/", P)
            proc.cell_filtering(P, prefix + "filtered/",
                                self.procs.get(FT_GENE))
            proc.stats_output(prefix, P, run_stats, bar_inval,
                              self.q30_bc, self.q30_rna)
            if proc.rf.read_stats_yes:
                self._cell_reads_stats(proc, prefix)

    def _cell_reads_stats(self, proc: SoloFeatureProc, prefix: str):
        """CellReads.stats (reference SoloFeature_statsOutput.cpp:88-121);
        reference iterates a libstdc++ unordered_map — see utils.stdhash"""
        from ..utils.stdhash import UnorderedMap
        um = UnorderedMap(reserve=proc.n_cb * 3 // 2)
        for cb, arr in proc.flag_counts.items():
            um.insert(cb, arr)
        with open(prefix + "CellReads.stats", "w") as f:
            f.write("CB\t" + "\t".join(FLAG_NAMES)
                    + "\tnUMIunique\tnGenesUnique\tnUMImulti\tnGenesMulti\n")
            f.write("CBnotInPasslist\t"
                    + "\t".join(str(x) for x in proc.rf.flag_counts_no_cb)
                    + "\t0\t0\t0\t0\n")
            multi = getattr(proc, "n_umi_per_cb_multi", None)
            for cb, arr in um.items():
                f.write(self.bc.wl_str[cb])
                for v in arr:
                    f.write(f"\t{v}")
                icb = int(proc.ind_cb_wl[cb])
                if icb == -1:
                    f.write("\t0\t0\t0\t0")
                else:
                    f.write(f"\t{proc.n_umi_per_cb[icb]}\t{proc.n_gene_per_cb[icb]}")
                    if multi is None:
                        f.write("\t0\t0")
                    else:
                        f.write(f"\t{fmt_g(multi[icb])}\t{proc.n_gene_per_cb_multi[icb]}")
                f.write("\n")
