#!/usr/bin/env bash
# One-shot LOBSTER 7z -> CSV extraction, the pre-conversion step in front
# of graft.core.Ingest (the engine itself reads headerless CSV / parquet;
# it does NOT embed a 7z codec — the reference streams archives via the
# py7zr library, chunk_pipeline.py:36-48, which has no JVM analog in
# this environment).
#
# Usage: tools/ingest_7z.sh <archive-dir> <out-dir>
#   Extracts every *.7z under <archive-dir> into <out-dir>/<archive-stem>/
#   using whichever of 7z / 7za / 7zr is on PATH.
#
# After extraction, load + convert once to the partitioned-parquet layout
# every query reads (spark-shell or a small driver):
#   val msgs = graft.core.Ingest.messagesCsv(spark, "<out-dir>/*/**_message_*.csv")
#   graft.core.Ingest.writeEvents(msgs, "<events-parquet-dir>")
set -euo pipefail

if [ $# -ne 2 ]; then
  echo "usage: $0 <archive-dir> <out-dir>" >&2
  exit 2
fi
ARCHIVE_DIR=$1
OUT_DIR=$2

SEVENZ=""
for c in 7z 7za 7zr; do
  if command -v "$c" >/dev/null 2>&1; then SEVENZ=$c; break; fi
done
if [ -z "$SEVENZ" ]; then
  cat >&2 <<'EOF'
No 7z binary found on PATH (looked for 7z, 7za, 7zr).
Install p7zip (e.g. `apt-get install p7zip-full`), or extract the
archives manually with any 7z tool, then point
graft.core.Ingest.messagesCsv / quotesCsv at the extracted CSVs.
EOF
  exit 1
fi

# recursive: LOBSTER dumps often arrive as <archive-dir>/<ticker>/*.7z.
# dest is keyed by the archive's path RELATIVE to <archive-dir> (slashes
# preserved), not the basename stem: AAPL/2015.7z and MSFT/2015.7z must
# extract to distinct dirs, not silently merge into one "2015".
found=0
while IFS= read -r -d '' a; do
  found=1
  rel=${a#"$ARCHIVE_DIR"/}
  rel=${rel%.7z}
  dest="$OUT_DIR/$rel"
  mkdir -p "$dest"
  echo "extracting $a -> $dest"
  "$SEVENZ" x -y -o"$dest" "$a" >/dev/null
done < <(find "$ARCHIVE_DIR" -type f -name '*.7z' -print0)
if [ "$found" -eq 0 ]; then
  echo "no *.7z archives under $ARCHIVE_DIR" >&2
  exit 1
fi
echo "done; next: convert the CSVs to partitioned parquet (see header)."
