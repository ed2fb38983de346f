#!/usr/bin/env bash
# Fetch the published cl100k_base tiktoken vocabulary export — the
# reference's actual tokenizer operating point (SemLink
# join_discoverer.py:34–62 truncates prompts at 2048/8191 cl100k tokens).
#
# This build environment has zero egress, so the ~1.7 MB ranks file
# cannot be bundled; the engine is format-complete without it
# (functions/Tiktoken.scala parses any base64-rank export) and runs on a
# small demo vocabulary until this script is run in a connected
# deployment.
#
# After fetching:
#   - `BpeEngine.resolveDefault` picks the file up automatically from
#     the conventional path data/cl100k_base.tiktoken (or point
#     GRAFT_TIKTOKEN_VOCAB at any vocabulary export, either format);
#   - the file-presence-gated vectors in TiktokenSpec activate and pin
#     published cl100k token counts;
#   - the q44 correctness gate's `vocab` column reports `cl100k_base`
#     instead of `demo`.
set -euo pipefail

# The canonical public URL (served by OpenAI's public blob store; the
# same URL tiktoken's own loader uses for cl100k_base).
URL="https://openaipublic.blob.core.windows.net/encodings/cl100k_base.tiktoken"
# Published content hash (sha256 of the export; tiktoken pins the blob
# by URL-embedded hash in newer releases — verify after download).
SHA256="223921b76ee99bde995b7ff738513eef100fb51d18c93597a113bcffe865b2a7"

DEST_DIR="$(cd "$(dirname "$0")/.." && pwd)/data"
DEST="$DEST_DIR/cl100k_base.tiktoken"

mkdir -p "$DEST_DIR"
echo "fetching $URL -> $DEST"
curl -fsSL "$URL" -o "$DEST.tmp"

GOT=$(sha256sum "$DEST.tmp" | cut -d' ' -f1)
if [ "$GOT" != "$SHA256" ]; then
  echo "sha256 mismatch: got $GOT want $SHA256" >&2
  echo "(the published export may have been rotated; verify the source" >&2
  echo " before trusting the file, then update SHA256 here)" >&2
  exit 1
fi
mv "$DEST.tmp" "$DEST"
echo "ok: $(wc -c < "$DEST") bytes at $DEST"
echo "export GRAFT_TIKTOKEN_VOCAB=$DEST  # optional; the conventional path is auto-detected"
