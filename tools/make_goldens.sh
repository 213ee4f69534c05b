#!/bin/bash
# Generate golden outputs with the reference STAR binary (read-only use of /root/reference).
# Goldens are committed under tests/golden/ and used by integration tests.
set -euo pipefail
STAR=/root/reference/bin/Linux_x86_64/STAR
cd "$(dirname "$0")/.."
DATA=tests/data/small
GOLD=tests/golden/small
mkdir -p "$GOLD"

# 1. genome index (no annotation)
rm -rf "$GOLD/genome_idx"; mkdir -p "$GOLD/genome_idx"
$STAR --runMode genomeGenerate --genomeDir "$GOLD/genome_idx" \
      --genomeFastaFiles "$DATA/genome.fa" --genomeSAindexNbases 8 \
      --runThreadN 2 --outFileNamePrefix "$GOLD/gg_" > /dev/null
rm -f "$GOLD/gg_Log.out"

# 2. SE alignment, default params, unsorted SAM
rm -rf "$GOLD/se"; mkdir -p "$GOLD/se"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se/" --outSAMunmapped Within > /dev/null

# 3. PE alignment
rm -rf "$GOLD/pe"; mkdir -p "$GOLD/pe"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_pe_1.fastq" "$DATA/reads_pe_2.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/pe/" --outSAMunmapped Within > /dev/null

# 4. genome index with GTF (sjdb)
rm -rf "$GOLD/genome_idx_gtf"; mkdir -p "$GOLD/genome_idx_gtf"
$STAR --runMode genomeGenerate --genomeDir "$GOLD/genome_idx_gtf" \
      --genomeFastaFiles "$DATA/genome.fa" --genomeSAindexNbases 8 \
      --sjdbGTFfile "$DATA/annot.gtf" --sjdbOverhang 99 \
      --runThreadN 2 --outFileNamePrefix "$GOLD/ggg_" > /dev/null
rm -f "$GOLD/ggg_Log.out"

# 5. SE alignment against sjdb index
rm -rf "$GOLD/se_gtf"; mkdir -p "$GOLD/se_gtf"
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_gtf/" --outSAMunmapped Within > /dev/null

# strip volatile lines (dates, versions paths) from logs we keep; drop tmp dirs
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.progress.out" -delete || true
find "$GOLD" -name "Log.out" -delete || true
echo "goldens written to $GOLD"

# 6. two-pass mode on plain index
rm -rf "$GOLD/se_2pass"; mkdir -p "$GOLD/se_2pass"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_2pass/" --outSAMunmapped Within \
      --twopassMode Basic > /dev/null
# 7. BySJout filtering
rm -rf "$GOLD/se_bysjout"; mkdir -p "$GOLD/se_bysjout"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_bysjout/" --outSAMunmapped Within \
      --outFilterType BySJout > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.progress.out" -delete || true
find "$GOLD" -name "Log.out" -delete || true

# 8. GeneCounts quantification
rm -rf "$GOLD/se_quant"; mkdir -p "$GOLD/se_quant"
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_quant/" --outSAMunmapped Within \
      --quantMode GeneCounts > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.progress.out" -delete || true
find "$GOLD" -name "Log.out" -delete || true

# 9. BAM outputs
rm -rf "$GOLD/se_bam"; mkdir -p "$GOLD/se_bam"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_bam/" --outSAMunmapped Within \
      --outSAMtype BAM Unsorted SortedByCoordinate > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.out" -delete || true

# 10. chimeric detection
rm -rf "$GOLD/se_chim"; mkdir -p "$GOLD/se_chim"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_chim.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_chim/" --outSAMunmapped Within \
      --chimSegmentMin 12 > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.out" -delete || true

# 11. signal + unmapped fastx
rm -rf "$GOLD/se_wig" "$GOLD/se_unm" "$GOLD/pe_unm"; mkdir -p "$GOLD/se_wig" "$GOLD/se_unm" "$GOLD/pe_unm"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" --runThreadN 1 \
      --outFileNamePrefix "$GOLD/se_wig/" --outSAMtype BAM SortedByCoordinate --outWigType bedGraph > /dev/null
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" --runThreadN 1 \
      --outFileNamePrefix "$GOLD/se_unm/" --outReadsUnmapped Fastx > /dev/null
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_pe_1.fastq" "$DATA/reads_pe_2.fastq" --runThreadN 1 \
      --outFileNamePrefix "$GOLD/pe_unm/" --outReadsUnmapped Fastx > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.out" -delete; find "$GOLD" -name "Log.progress.out" -delete || true

# 12. TranscriptomeSAM
rm -rf "$GOLD/se_trsam"; mkdir -p "$GOLD/se_trsam"
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_trsam/" --quantMode TranscriptomeSAM > /dev/null
rm -f "$GOLD/se_trsam/Aligned.out.sam" "$GOLD/se_trsam/SJ.out.tab"
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.out" -delete; find "$GOLD" -name "Log.progress.out" -delete || true

# 13. STARsolo
rm -rf "$GOLD/solo"; mkdir -p "$GOLD/solo"
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/solo_cdna.fastq" "$DATA/solo_bc.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/solo/" --soloType CB_UMI_Simple \
      --soloCBwhitelist "$DATA/solo_wl.txt" --soloCBstart 1 --soloCBlen 16 \
      --soloUMIstart 17 --soloUMIlen 12 --outSAMtype None > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.out" -delete; find "$GOLD" -name "Log.progress.out" -delete || true

# 14. STARsolo multi-feature (GeneFull variants, SJ, Velocyto, CellReads.stats)
rm -rf "$GOLD/solo_feat"; mkdir -p "$GOLD/solo_feat"
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/solo_cdna.fastq" "$DATA/solo_bc.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/solo_feat/" --soloType CB_UMI_Simple \
      --soloCBwhitelist "$DATA/solo_wl.txt" --soloCBstart 1 --soloCBlen 16 \
      --soloUMIstart 17 --soloUMIlen 12 --outSAMtype None \
      --soloFeatures Gene GeneFull GeneFull_ExonOverIntron GeneFull_Ex50pAS SJ Velocyto \
      --soloCellReadStats Standard > /dev/null
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" -name "Log.out" -delete; find "$GOLD" -name "Log.progress.out" -delete || true

# 15. STARsolo dedup/multimapper/MultiGeneUMI modes (solo3 dataset,
#     generated by tools/make_solo_data.py)
D3=tests/data/solo3
G3=tests/golden/solo3
python3 tools/make_solo_data.py
rm -rf "$G3"; mkdir -p "$G3/idx"
$STAR --runMode genomeGenerate --genomeDir "$G3/idx" --genomeFastaFiles "$D3/genome.fa" \
      --genomeSAindexNbases 7 --sjdbGTFfile "$D3/annot.gtf" --sjdbOverhang 79 \
      --runThreadN 2 --outFileNamePrefix "$G3/gg_" > /dev/null
solo3common="--genomeDir $G3/idx --readFilesIn $D3/cdna.fastq $D3/bc.fastq --runThreadN 1 \
      --soloType CB_UMI_Simple --soloCBwhitelist $D3/wl.txt --soloCBstart 1 --soloCBlen 16 \
      --soloUMIstart 17 --soloUMIlen 12 --outSAMtype None --soloCellFilter TopCells 8"
$STAR $solo3common --outFileNamePrefix "$G3/dedup/" \
      --soloUMIdedup NoDedup Exact 1MM_All 1MM_Directional 1MM_CR 1MM_Directional_UMItools > /dev/null
$STAR $solo3common --outFileNamePrefix "$G3/mm/" \
      --soloMultiMappers Uniform Rescue PropUnique EM --soloCellReadStats Standard > /dev/null
$STAR $solo3common --outFileNamePrefix "$G3/mgumi/" --soloUMIfiltering MultiGeneUMI > /dev/null
$STAR $solo3common --outFileNamePrefix "$G3/mgumicr/" \
      --soloUMIfiltering MultiGeneUMI_CR --soloUMIdedup 1MM_CR > /dev/null
find "$G3" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$G3" \( -name "Log.out" -o -name "Log.progress.out" -o -name "gg_*" \) -delete || true

# 16. soloCellFiltering runMode (re-filter a raw matrix, EmptyDrops_CR)
rm -rf "$G3/cellfilt"; mkdir -p "$G3/cellfilt"
$STAR --runMode soloCellFiltering "$G3/mgumi/Solo.out/Gene/raw" "$G3/cellfilt/out_" \
      --soloCellFilter EmptyDrops_CR 8 0.99 10 100 400 10 0.01 200 0.01 300 \
      --outFileNamePrefix "$G3/cellfilt/" > /dev/null
rm -rf "$G3/cellfilt/_STARtmp" "$G3/cellfilt/Log.out" "$G3/cellfilt/Log.progress.out"

# 17. solo SAM attributes: CR/CY/UR/UY/GX/GN + CB/UB (sorted) and gx/gn (unsorted)
rm -rf "$GOLD/solo_tags"; mkdir -p "$GOLD/solo_tags"
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/solo_cdna.fastq" "$DATA/solo_bc.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/solo_tags/" --soloType CB_UMI_Simple \
      --soloCBwhitelist "$DATA/solo_wl.txt" --soloCBstart 1 --soloCBlen 16 \
      --soloUMIstart 17 --soloUMIlen 12 --outSAMtype BAM SortedByCoordinate \
      --outSAMattributes NH HI AS nM CR CY UR UY GX GN CB UB > /dev/null
$STAR --genomeDir "$GOLD/genome_idx_gtf" --readFilesIn "$DATA/solo_cdna.fastq" "$DATA/solo_bc.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/solo_tags/un_" --soloType CB_UMI_Simple \
      --soloCBwhitelist "$DATA/solo_wl.txt" --soloCBstart 1 --soloCBlen 16 \
      --soloUMIstart 17 --soloUMIlen 12 --outSAMtype BAM Unsorted \
      --outSAMattributes NH HI AS nM CR CY UR UY GX GN gx gn --outSAMunmapped Within > /dev/null
rm -rf "$GOLD/solo_tags/un_Solo.out" "$GOLD/solo_tags/un_SJ.out.tab"
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GOLD" \( -name "Log.out" -o -name "Log.progress.out" \) -delete || true

# 18. read clipping (reads_clip.fastq generated inline in repo history)
rm -rf "$GOLD/clip"; mkdir -p "$GOLD/clip"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_clip.fastq" --runThreadN 1 \
      --outFileNamePrefix "$GOLD/clip/ham_" --outSAMunmapped Within \
      --clip3pAdapterSeq AGATCGGAAGAGC --clip5pNbases 3 --clip3pNbases 2 \
      --clip3pAfterAdapterNbases 1 > /dev/null
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_clip.fastq" --runThreadN 1 \
      --outFileNamePrefix "$GOLD/clip/cr4_" --outSAMunmapped Within \
      --clipAdapterType CellRanger4 > /dev/null
find "$GOLD/clip" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
rm -f "$GOLD"/clip/*Log.out "$GOLD"/clip/*Log.progress.out

# 19. PE mate-overlap merge-remap
rm -rf "$GOLD/peov"; mkdir -p "$GOLD/peov"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_peov_1.fastq" "$DATA/reads_peov_2.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/peov/" --outSAMunmapped Within \
      --peOverlapNbasesMin 10 > /dev/null
find "$GOLD/peov" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
rm -f "$GOLD"/peov/Log.out "$GOLD"/peov/Log.progress.out

# 20. BAM duplicate marking (inputAlignmentsFromBAM + bamRemoveDuplicatesType)
rm -rf "$GOLD/dedup"; mkdir -p "$GOLD/dedup"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_dedup_1.fastq" "$DATA/reads_dedup_2.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/dedup/" --outSAMtype BAM SortedByCoordinate > /dev/null
$STAR --runMode inputAlignmentsFromBAM --inputBAMfile "$GOLD/dedup/Aligned.sortedByCoord.out.bam" \
      --bamRemoveDuplicatesType UniqueIdentical --outFileNamePrefix "$GOLD/dedup/" > /dev/null
$STAR --runMode inputAlignmentsFromBAM --inputBAMfile "$GOLD/dedup/Aligned.sortedByCoord.out.bam" \
      --bamRemoveDuplicatesType UniqueIdenticalNotMulti --outFileNamePrefix "$GOLD/dedup/nm_" > /dev/null
find "$GOLD/dedup" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
rm -f "$GOLD"/dedup/*Log* "$GOLD"/dedup/*SJ.out.tab

# 21. liftOver runMode
rm -rf "$GOLD/liftover"; mkdir -p "$GOLD/liftover"
$STAR --runMode liftOver --genomeChainFiles "$DATA/lift.chain" \
      --sjdbGTFfile "$DATA/lift.gtf" --outFileNamePrefix "$GOLD/liftover/" > /dev/null
rm -f "$GOLD"/liftover/Log.out "$GOLD"/liftover/Log.progress.out

# 22. Variation (vA/vG) and WASP (vW) BAM tags
python tools/make_var_vcf.py
rm -rf "$GOLD/wasp" "$GOLD/var"; mkdir -p "$GOLD/wasp" "$GOLD/var"
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/var/" --outSAMtype BAM Unsorted \
      --outSAMattributes NH HI AS nM vA vG --varVCFfile "$DATA/var.vcf" > /dev/null
$STAR --genomeDir "$GOLD/genome_idx" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/wasp/" --outSAMtype BAM Unsorted \
      --outSAMattributes NH HI AS nM vA vG vW --varVCFfile "$DATA/var.vcf" \
      --waspOutputMode SAMtag > /dev/null
find "$GOLD/wasp" "$GOLD/var" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
rm -f "$GOLD"/wasp/*Log* "$GOLD"/wasp/*SJ.out.tab "$GOLD"/var/*Log* "$GOLD"/var/*SJ.out.tab

# 23. STARsolo CB_UMI_Complex (inDrop-style geometry, soloC dataset)
python3 tools/make_complex_data.py
DC=tests/data/soloC
GC=tests/golden/soloC
rm -rf "$GC"; mkdir -p "$GC"
soloCcommon="--genomeDir tests/golden/solo3/idx --readFilesIn $DC/cdna.fastq $DC/bc.fastq \
      --runThreadN 1 --soloType CB_UMI_Complex --soloCBwhitelist $DC/wl1.txt $DC/wl2.txt \
      --soloCBposition 0_0_2_-1 3_1_3_8 --soloUMIposition 3_9_3_14 \
      --soloAdapterSequence GAGTGATTGCTT --outSAMtype None --soloCellFilter TopCells 6"
$STAR $soloCcommon --outFileNamePrefix "$GC/mm1/"   --soloCBmatchWLtype 1MM > /dev/null
$STAR $soloCcommon --outFileNamePrefix "$GC/exact/" --soloCBmatchWLtype Exact > /dev/null
$STAR $soloCcommon --outFileNamePrefix "$GC/ed2/"   --soloCBmatchWLtype EditDist_2 > /dev/null
find "$GC" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true
find "$GC" -name "Log*.out" -delete 2>/dev/null; find "$GC" -name "SJ.out.tab" -delete 2>/dev/null || true

# 33. sparse suffix array (genomeSAsparseD 2): index + SE alignment
rm -rf "$GOLD/genome_idx_sp2"; mkdir -p "$GOLD/genome_idx_sp2"
$STAR --runMode genomeGenerate --genomeDir "$GOLD/genome_idx_sp2" \
      --genomeFastaFiles "$DATA/genome.fa" --genomeSAindexNbases 8 \
      --genomeSAsparseD 2 \
      --runThreadN 2 --outFileNamePrefix "$GOLD/ggsp_" > /dev/null
rm -f "$GOLD"/ggsp_Log* 2>/dev/null || true
rm -rf "$GOLD/se_sp2"; mkdir -p "$GOLD/se_sp2"
$STAR --genomeDir "$GOLD/genome_idx_sp2" --readFilesIn "$DATA/reads_se.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/se_sp2/" --outSAMunmapped Within > /dev/null
rm -rf "$GOLD/pe_sp2"; mkdir -p "$GOLD/pe_sp2"
$STAR --genomeDir "$GOLD/genome_idx_sp2" --readFilesIn "$DATA/reads_pe_1.fastq" "$DATA/reads_pe_2.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/pe_sp2/" --outSAMunmapped Within > /dev/null
find "$GOLD/se_sp2" "$GOLD/pe_sp2" \( -name "Log.progress.out" -o -name "Log.out" \) -delete || true
find "$GOLD" -name "_STARtmp" -type d -exec rm -rf {} + 2>/dev/null || true

# 34. STARlong long-read mode (reference STARlong binary,
# COMPILE_FOR_LONG_READS: IncludeDefine.h:126-140)
python3 tools/make_long_reads.py
rm -rf "$GOLD/long"; mkdir -p "$GOLD/long"
/root/reference/bin/Linux_x86_64/STARlong --genomeDir "$GOLD/genome_idx" \
      --readFilesIn "$DATA/reads_long.fastq" \
      --runThreadN 1 --outFileNamePrefix "$GOLD/long/" --outSAMunmapped Within > /dev/null
rm -rf "$GOLD/long/_STARtmp" "$GOLD/long/Log.out" "$GOLD/long/Log.progress.out"
