#!/usr/bin/env bash
# Cell-line evaluation pipeline template (capability of the reference's
# scripts/hct116.sh, k562.sh, mcf7.sh, ...): predict -> chop -> remap ->
# softclip/chimera statistics, parameterized by sample name.
#
#   scripts/cellline_pipeline.sh hct116 /data/hct116.fastq /ref/hg38.fa ckpt.pt
set -euo pipefail

SAMPLE="${1:?sample name}"
FASTQ="${2:?input fastq}"
GENOME="${3:?reference fasta (for minimap2)}"
CKPT="${4:?torch checkpoint}"
THREADS="${THREADS:-8}"
OUT="${OUT:-${SAMPLE}_dc}"

mkdir -p "$OUT"

echo "[1/5] predict" >&2
python -m deepchopper_tpu.cli predict "$FASTQ" \
    --output "$OUT/predictions" --torch-checkpoint "$CKPT"

echo "[2/5] chop" >&2
python -m deepchopper_tpu.cli chop "$OUT/predictions/0" "$FASTQ" \
    --output "$OUT/$SAMPLE" --threads "$THREADS"
CHOPPED=$(ls "$OUT/$SAMPLE".*record.chop.fq.gz | head -1)

echo "[3/5] map original + chopped (minimap2 must be on PATH)" >&2
minimap2 -ax map-ont -t "$THREADS" "$GENOME" "$FASTQ" | samtools sort -o "$OUT/${SAMPLE}.orig.bam"
minimap2 -ax map-ont -t "$THREADS" "$GENOME" "$CHOPPED" | samtools sort -o "$OUT/${SAMPLE}.chop.bam"

echo "[4/5] chimera / softclip statistics" >&2
python -m deepchopper_tpu.cli tools chimericstat "$OUT/${SAMPLE}.orig.bam"
python -m deepchopper_tpu.cli tools chimericstat "$OUT/${SAMPLE}.chop.bam"
python -m deepchopper_tpu.cli tools scdiff "$OUT/${SAMPLE}.orig.bam" "$OUT/${SAMPLE}.chop.bam"
python -m deepchopper_tpu.cli tools diff "$FASTQ" "$CHOPPED"

echo "[5/5] interval-level evaluation" >&2
python -m deepchopper_tpu.cli eval-bam "$OUT/${SAMPLE}.orig.bam" "$OUT/predictions/0" \
    --output-dir "$OUT"

echo "done -> $OUT" >&2
