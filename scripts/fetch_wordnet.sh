#!/usr/bin/env bash
# Fetch the Princeton WordNet 3.0 database files — the full-breadth
# synonym dictionary the reference consults through `wordnet.synsets`
# (SemanticAnnotation/json_parser.py:99–126, ~117k synsets).
#
# This build environment has zero egress, so the ~10 MB database cannot
# be bundled; the engine is format-complete without it
# (annotate/Canonicalize.parseWordNetData parses the wndb format) and
# runs on the bundled ~800-group dictionary until this script is run in
# a connected deployment.
#
# After fetching:
#   - `Canonicalize.loadWordNetDir(data/wordnet/dict)` returns the full
#     term → synset-union map; pass it to `canonicalizeAnnotations`;
#   - the file-presence-gated tests in AnnotateSpec activate and pin
#     known WordNet synset groupings (car/auto/automobile, …).
#
# WordNet 3.0 is distributed by Princeton University under the WordNet
# license (free for any purpose, attribution required).
set -euo pipefail

URL="https://wordnetcode.princeton.edu/3.0/WNdb-3.0.tar.gz"

# Integrity policy: REFUSE to extract unverified content by default.
# Either export WORDNET_SHA256=<published checksum> (pin it against
# Princeton's distribution page — this script was authored in a
# zero-egress environment, so no hash could be confirmed at write
# time), or pass --no-verify to explicitly accept an unverified
# tarball (e.g. for a first fetch whose hash you then pin).
NO_VERIFY=0
if [ "${1:-}" = "--no-verify" ]; then NO_VERIFY=1; fi
if [ -z "${WORDNET_SHA256:-}" ] && [ "$NO_VERIFY" != "1" ]; then
  echo "refusing to extract unverified content: set WORDNET_SHA256 to" >&2
  echo "the published WNdb-3.0.tar.gz checksum, or re-run with" >&2
  echo "  $0 --no-verify" >&2
  echo "to accept the fetch unverified (then pin the printed hash)." >&2
  exit 1
fi

DEST_DIR="$(cd "$(dirname "$0")/.." && pwd)/data/wordnet"
mkdir -p "$DEST_DIR"
TMP="$DEST_DIR/wndb.tar.gz.tmp"

echo "fetching $URL"
curl -fsSL "$URL" -o "$TMP"

GOT=$(sha256sum "$TMP" | cut -d' ' -f1)
if [ -n "${WORDNET_SHA256:-}" ] && [ "$GOT" != "$WORDNET_SHA256" ]; then
  echo "sha256 mismatch: got $GOT want $WORDNET_SHA256" >&2
  rm -f "$TMP"
  exit 1
fi
if [ -n "${WORDNET_SHA256:-}" ]; then
  echo "sha256 verified: $GOT"
else
  echo "sha256 UNVERIFIED (--no-verify): $GOT  — pin this via WORDNET_SHA256"
fi
tar -xzf "$TMP" -C "$DEST_DIR"   # extracts dict/data.{noun,verb,adj,adv} …
rm -f "$TMP"
echo "ok: $(ls "$DEST_DIR/dict" | wc -l) files at $DEST_DIR/dict"
echo "use: Canonicalize.loadWordNetDir(\"$DEST_DIR/dict\")"
