"""STARsolo: single-cell CB/UMI gene counting (CB_UMI_Simple).

Reference behavior: source/SoloReadBarcode_getCBandUMI.cpp (CB extraction,
whitelist exact/1MM matching, UMI checks), source/Transcriptome_classifyAlign.cpp
(Gene feature: unique exonic concordant), source/SoloReadFeature_record.cpp +
SoloReadFeature_inputRecords.cpp (counting rules: 1MM-without-exact rejection,
multi-match posterior resolution), source/SoloFeature_collapseUMIall.cpp +
collapseUMI_Graph.cpp (UMI collapse: 1MM_All = connected components under
1-mismatch), source/SoloFeature_cellFiltering.cpp (CellRanger2.2 knee),
source/SoloFeature_outputResults.cpp (MatrixMarket output).

This is the host implementation; the counting kernels (WL binary search, UMI
collapse via segmented sort) are batched on device in later rounds.
"""
from __future__ import annotations

import math
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

HOMOPOLYMER_BASES = "ACGT"


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
        """returns (cbMatch, matchList) where matchList entries are
        (wl_index, qual_char)"""
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
                    if matches:  # multiple N-base matches not allowed by default
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


# ----------------------------------------------------------- Gene classify
AVT_CONCORDANT = 0  # reference AlignVsTranscript enum: Concordant/Intron/ExonIntron/ExonIntronSpan
AVT_INTRON = 1
AVT_EXON_INTRON = 2
AVT_SPAN = 3


def _le_left(arr, x):
    """index of element <= x, leftmost if equal; None if out of range"""
    if x > arr[-1] or x < arr[0]:
        return None
    i = int(np.searchsorted(arr, x, side="left"))
    if i < len(arr) and arr[i] == x:
        return i
    return i - 1


def _align_vs_transcript(tr_obj, trm, tr1):
    i0 = int(trm.tr_ex_i[tr1])
    ex_n = int(trm.tr_ex_n[tr1])
    ex_se = trm.ex_se[2 * i0:2 * (i0 + ex_n)]
    tr_s = int(trm.tr_s[tr1])
    intronic = exonic = span = False
    concordant = True
    ex1 = 0
    eE = enS = 0
    bE = 0
    for iab in range(tr_obj.nExons):
        bE_prev = bE
        if tr_obj.exons[iab][1] < tr_s:
            return -1
        bS = tr_obj.exons[iab][1] - tr_s
        bE = bS + tr_obj.exons[iab][2] - 1
        if iab == 0 or tr_obj.canonSJ[iab - 1] == -3:
            r = _le_left(ex_se, bS)
            if r is None:
                return -1
            ex1 = r // 2
        elif tr_obj.canonSJ[iab - 1] >= 0:
            if bE_prev == eE and bS == enS:
                ex1 += 1
            else:
                concordant = False
                r = _le_left(ex_se, bS)
                if r is None:
                    return -1
                ex1 = r // 2
        eE = int(ex_se[2 * ex1 + 1])
        enS = int(ex_se[2 * (ex1 + 1)]) if ex1 + 1 < ex_n else 0
        if bS <= eE:
            if bE > eE:
                span = True
            exonic = True
        else:
            if bE >= enS:
                span = True
            intronic = True
    if not concordant:
        return -1
    if span:
        return AVT_SPAN
    if not intronic:
        return AVT_CONCORDANT
    return AVT_EXON_INTRON if exonic else AVT_INTRON


def classify_gene(res, trm, strand: int):
    """gene set for the Gene feature (unique exonic concordant alignments)"""
    genes = set()
    for i in range(res.n_tr):
        a = res.transcripts[i]
        tr1 = int(np.searchsorted(trm.tr_s, a.exons[0][1], side="right")) - 1
        if tr1 < 0:
            continue
        a_end = a.exons[-1][1] + a.exons[-1][2] - 1
        tr1 += 1
        while True:
            tr1 -= 1
            ok = a_end <= trm.tr_e[tr1]
            if ok and strand >= 0:
                a_str = a.Str if trm.tr_str[tr1] == 1 else 1 - a.Str
                ok = (a_str == strand)
            if ok:
                if _align_vs_transcript(a, trm, tr1) == AVT_CONCORDANT:
                    genes.add(int(trm.tr_gene[tr1]))
            if not (trm.tr_emax[tr1] >= a_end and tr1 > 0):
                break
    return genes


# ------------------------------------------------------------- processing
BAR_STATS = ["noNoAdapter", "noNoUMI", "noNoCB", "noNinCB", "noNinUMI",
             "noUMIhomopolymer", "noNoWLmatch", "noTooManyMM",
             "noTooManyWLmatches", "yesWLmatchExact", "yesOneWLmatchWithMM",
             "yesMultWLmatchWithMM"]
FEAT_STATS = ["noUnmapped", "noNoFeature", "MultiFeature",
              "subMultiFeatureMultiGenomic", "noTooManyWLmatches",
              "noMMtoWLwithoutExact", "yesWLmatch", "yessubWLmatchExact",
              "yessubWLmatch_UniqueFeature", "yesCellBarcodes", "yesUMIs"]


class SoloGene:
    """CB_UMI_Simple, feature=Gene, umiDedup 1MM_All, multimappers Unique"""

    def __init__(self, gi, P, trm):
        self.gi = gi
        self.P = P
        self.trm = trm
        self.bc = SoloBarcodes(P)
        self.records = []  # (umi, gene, cbMatch, matches)
        self.cb_read_count = np.zeros(len(self.bc.wl), dtype=np.int64)
        self.strand = {"Unstranded": -1, "Forward": 0, "Reverse": 1}[P.soloStrand]
        self.bar_stats = dict.fromkeys(BAR_STATS, 0)
        self.feat_stats = dict.fromkeys(FEAT_STATS, 0)
        self.n_reads = 0
        self.q30_bc = [0, 0]   # [q30, total] for CB+UMI qualities
        self.q30_rna = [0, 0]

    def add_read(self, res, b_seq: str, b_qual: str):
        self.n_reads += 1
        cb_match, matches, umi = self.bc.get_cb_umi(b_seq, b_qual)
        bc = self.bc
        q = b_qual[bc.cb_s:bc.cb_s + bc.cb_l] + b_qual[bc.umi_s:bc.umi_s + bc.umi_l]
        self.q30_bc[1] += len(q)
        self.q30_bc[0] += sum(1 for c in q if ord(c) >= 33 + 30)
        for qs in res.quals:
            self.q30_rna[1] += len(qs)
            self.q30_rna[0] += sum(1 for c in qs if ord(c) >= 33 + 30)
        # barcode-stage stats (reference SoloReadBarcode::addStats)
        key = {0: "yesWLmatchExact", 1: "yesOneWLmatchWithMM",
               -1: "noNoWLmatch", -2: "noNinCB", -3: "noTooManyWLmatches",
               -11: "noNoCB", -12: "noTooManyMM", -23: "noNinUMI",
               -24: "noUMIhomopolymer"}.get(cb_match, "yesMultWLmatchWithMM")
        self.bar_stats[key] += 1
        if cb_match < 0:
            return
        if res.unmap_type >= 0 or res.n_tr == 0:
            # reads failing the mapping filters contribute no feature
            self.feat_stats["noUnmapped"] += 1
            return
        genes = classify_gene(res, self.trm, self.strand)
        if len(genes) == 0:
            self.feat_stats["noNoFeature"] += 1
            return
        if len(genes) > 1:
            self.feat_stats["MultiFeature"] += 1
            if res.n_tr > 1:
                self.feat_stats["subMultiFeatureMultiGenomic"] += 1
            return  # multimappers Unique: multi-gene reads are not counted
        gene = next(iter(genes))
        self.records.append((umi, gene, cb_match, matches))
        for (cbi, _) in matches:
            self.cb_read_count[cbi] += 1

    # ---------------------------------------------------------------- post
    def process(self, out_dir: str):
        P = self.P
        bc = self.bc
        per_cb: Dict[int, list] = defaultdict(list)
        per_cb_exact: Dict[int, int] = defaultdict(int)
        for (umi, gene, cb_match, matches) in self.records:
            if cb_match <= 1:
                cbi = matches[0][0]
                if bc.one_exact and cb_match == 1 and bc.cb_read_count_exact[cbi] == 0:
                    self.feat_stats["noMMtoWLwithoutExact"] += 1
                    continue
                if cb_match == 0:
                    self.feat_stats["yessubWLmatchExact"] += 1
                    per_cb_exact[cbi] += 1
                per_cb[cbi].append((gene, umi))
            else:
                ptot = 0.0
                pmax = 0.0
                cb_best = -1
                for (cbi, q) in matches:
                    if bc.cb_read_count_exact[cbi] > 0:
                        qv = min(ord(q) - 33, 33)
                        pin = np.float32(bc.cb_read_count_exact[cbi]) * np.float32(10.0 ** (-qv / 10.0))
                        ptot += pin
                        if pin > pmax:
                            pmax = pin
                            cb_best = cbi
                if ptot > 0.0 and pmax >= 0.975 * ptot:
                    per_cb[cb_best].append((gene, umi))
                else:
                    self.feat_stats["noTooManyWLmatches"] += 1

        # per-CB gene/UMI collapse
        cbs = sorted(per_cb.keys())
        counts: Dict[int, List[Tuple[int, int]]] = {}
        n_umi_per_cb = {}
        for cbi in cbs:
            rows = sorted(per_cb[cbi])
            gene_counts = []
            i = 0
            total_umi = 0
            while i < len(rows):
                j = i
                umis = {}
                while j < len(rows) and rows[j][0] == rows[i][0]:
                    umis[rows[j][1]] = umis.get(rows[j][1], 0) + 1
                    j += 1
                n = _umi_1mm_all(list(umis.keys()), self.bc.umi_l)
                if n > 0:
                    gene_counts.append((rows[i][0], n))
                    total_umi += n
                i = j
            if gene_counts:
                counts[cbi] = gene_counts
                n_umi_per_cb[cbi] = total_umi
        self.counts = counts
        self.n_umi_per_cb = n_umi_per_cb

        # cell filtering (CellRanger2.2 knee, optionally EmptyDrops_CR on top)
        filt = P.soloCellFilter
        filtered = set()
        n_umi_sorted = sorted(n_umi_per_cb.values(), reverse=True)
        if n_umi_sorted and filt[0] in ("CellRanger2.2", "EmptyDrops_CR"):
            n_expected = int(filt[1]) if len(filt) > 1 else 3000
            max_perc = float(filt[2]) if len(filt) > 2 else 0.99
            max_min_ratio = float(filt[3]) if len(filt) > 3 else 10.0
            maxind = int(round(n_expected * (1.0 - max_perc)))
            n_umi_max = n_umi_sorted[min(len(n_umi_sorted) - 1, maxind)]
            n_umi_min = max(int(round(n_umi_max / max_min_ratio)), 1)
            for cbi, n in n_umi_per_cb.items():
                if n >= n_umi_min:
                    filtered.add(cbi)
        elif filt[0] == "TopCells" and n_umi_sorted:
            top = int(filt[1])
            n_umi_min = n_umi_sorted[min(len(n_umi_sorted) - 1, top)]
            filtered = {c for c, n in n_umi_per_cb.items() if n >= n_umi_min}
        if filt[0] == "EmptyDrops_CR" and filtered:
            from .emptydrops import empty_drops_cr
            filtered = filtered | empty_drops_cr(
                counts, n_umi_per_cb, self.trm.n_genes, filtered, P)

        # feature-stage summary stats
        self.feat_stats["yesWLmatch"] = sum(len(v) for v in per_cb.values() if v)
        self.feat_stats["yessubWLmatch_UniqueFeature"] = self.feat_stats["yesWLmatch"]
        self.feat_stats["yesCellBarcodes"] = len(counts)
        self.feat_stats["yesUMIs"] = sum(n_umi_per_cb.values())
        self.per_cb_read_n = {c: len(v) for c, v in per_cb.items()}

        self._write(out_dir, filtered, n_umi_sorted)
        self._write_stats(out_dir, filtered)
        return counts

    def _write_stats(self, out_dir, filtered):
        def fmt_stats(d):
            return "".join(f"{k:>50}{v:>15}\n" for k, v in d.items())
        with open(os.path.join(out_dir, "Barcodes.stats"), "w") as f:
            f.write(fmt_stats(self.bar_stats))
        gene_dir = os.path.join(out_dir, "Gene")
        with open(os.path.join(gene_dir, "Features.stats"), "w") as f:
            f.write(fmt_stats(self.feat_stats))

        # Summary.csv (reference SoloFeature_statsOutput.cpp)
        def g(x):
            return f"{x:g}"
        n = self.n_reads
        fs = self.feat_stats
        bs = self.bar_stats
        inval = sum(bs[k] for k in BAR_STATS[:9])             + fs["noTooManyWLmatches"] + fs["noMMtoWLwithoutExact"]
        lines = [f"Number of Reads,{n}",
                 f"Reads With Valid Barcodes,{g(1.0 - inval / n)}" if n else "Reads With Valid Barcodes,0",
                 f"Sequencing Saturation,{g(1.0 - fs['yesUMIs'] / fs['yessubWLmatch_UniqueFeature'])}"
                 if fs['yessubWLmatch_UniqueFeature'] else "Sequencing Saturation,-nan",
                 f"Q30 Bases in CB+UMI,{g(self.q30_bc[0] / max(self.q30_bc[1], 1))}",
                 f"Q30 Bases in RNA read,{g(self.q30_rna[0] / max(self.q30_rna[1], 1))}",
                 f"Reads Mapped to Genome: Unique+Multiple,{g(self.stats_mapped_um / n)}",
                 f"Reads Mapped to Genome: Unique,{g(self.stats_mapped_u / n)}",
                 "Reads Mapped to Gene: Unique+Multiple Gene,NoMulti",
                 f"Reads Mapped to Gene: Unique Gene,{g(fs['yessubWLmatch_UniqueFeature'] / n)}"]
        # filtered-cell block
        cells = sorted(filtered)
        if cells:
            n_cells = len(cells)
            reads_in = [self.per_cb_read_n.get(c, 0) for c in cells]
            umis_in = [self.n_umi_per_cb.get(c, 0) for c in cells]
            genes_in = [len(self.counts.get(c, [])) for c in cells]
            gene_set = set()
            for c in cells:
                for (gg, _) in self.counts.get(c, []):
                    gene_set.add(gg)
            n_umi_sorted = sorted(self.n_umi_per_cb.values(), reverse=True)
            lines += [
                f"Estimated Number of Cells,{n_cells}",
                f"Unique Reads in Cells Mapped to Gene,{sum(reads_in)}",
                f"Fraction of Unique Reads in Cells,{g(sum(reads_in) / fs['yessubWLmatch_UniqueFeature'])}",
                f"Mean Reads per Cell,{sum(reads_in) // n_cells}",
                f"Median Reads per Cell,{sorted(reads_in)[n_cells // 2]}",
                f"UMIs in Cells,{sum(umis_in)}",
                f"Mean UMI per Cell,{sum(umis_in) // n_cells}",
                f"Median UMI per Cell,{n_umi_sorted[n_cells // 2]}",
                f"Mean Gene per Cell,{sum(genes_in) // n_cells}",
                f"Median Gene per Cell,{sorted(genes_in)[n_cells // 2]}",
                f"Total Gene Detected,{len(gene_set)}"]
        with open(os.path.join(gene_dir, "Summary.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

    def _write(self, out_dir, filtered, n_umi_sorted):
        trm = self.trm
        gene_dir = os.path.join(out_dir, "Gene")
        raw = os.path.join(gene_dir, "raw")
        flt = os.path.join(gene_dir, "filtered")
        os.makedirs(raw, exist_ok=True)
        os.makedirs(flt, exist_ok=True)

        features = "".join(f"{g}\t{n}\tGene Expression\n"
                           for g, n in zip(trm.gene_id, trm.gene_name))
        for d in (raw, flt):
            with open(os.path.join(d, "features.tsv"), "w") as f:
                f.write(features)
        with open(os.path.join(raw, "barcodes.tsv"), "w") as f:
            f.write("".join(s + "\n" for s in self.bc.wl_str))
        with open(os.path.join(flt, "barcodes.tsv"), "w") as f:
            f.write("".join(self.bc.wl_str[c] + "\n" for c in sorted(filtered)))

        n_entries = sum(len(v) for v in self.counts.values())
        with open(os.path.join(raw, "matrix.mtx"), "w") as f:
            f.write("%%MatrixMarket matrix coordinate integer general\n%\n")
            f.write(f"{trm.n_genes} {len(self.bc.wl_str)} {n_entries}\n")
            for cbi in sorted(self.counts.keys()):
                for (g, n) in self.counts[cbi]:
                    f.write(f"{g + 1} {cbi + 1} {n}\n")
        n_entries_f = sum(len(self.counts[c]) for c in filtered)
        with open(os.path.join(flt, "matrix.mtx"), "w") as f:
            f.write("%%MatrixMarket matrix coordinate integer general\n%\n")
            f.write(f"{trm.n_genes} {len(filtered)} {n_entries_f}\n")
            ci = 0
            for cbi in sorted(self.counts.keys()):
                if cbi not in filtered:
                    continue
                ci += 1
                for (g, n) in self.counts[cbi]:
                    f.write(f"{g + 1} {ci} {n}\n")
        with open(os.path.join(gene_dir, "UMIperCellSorted.txt"), "w") as f:
            f.write("".join(f"{n}\n" for n in n_umi_sorted))


def _umi_1mm_all(umis: List[int], umi_l: int) -> int:
    """1MM_All collapse = number of connected components under 1-mismatch
    (reference: umiArrayCorrect_Graph + collapseUMIwith1MMlowHalf)."""
    n = len(umis)
    if n <= 1:
        return n
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            x = umis[i] ^ umis[j]
            # 1 mismatch iff xor confined to one 2-bit base slot
            if x and (x >> ((x & -x).bit_length() - 1 >> 1 << 1)) <= 3:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    return len({find(i) for i in range(n)})
