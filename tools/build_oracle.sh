#!/bin/bash
# Build the REFERENCE agrep binary as a conformance-test oracle.
# Sources are read from /root/reference (read-only); they are preprocessed
# (DOS ^Z EOF bytes stripped) into the gitignored scratch dir .oracle/src/
# and compiled there.  Nothing under .oracle/ is part of this framework's
# implementation -- it exists only so tests can diff our output against the
# reference binary byte-for-byte (SURVEY.md section 4, step 1).
set -e
REF=${REF:-/root/reference}
OUT=$(cd "$(dirname "$0")/.." && pwd)/.oracle
mkdir -p "$OUT/src"
UNITS="follow asearch asearch1 agrep bitap checkfil compat dummyfil main maskgen parse checksg preproce delim asplit recursiv sgrep newmgrep utilitie codepage agrephlp"
for h in "$REF"/*.h "$REF"/*.lst; do tr -d '\032' < "$h" > "$OUT/src/$(basename "$h")"; done
for u in $UNITS putils; do tr -d '\032' < "$REF/$u.c" > "$OUT/src/$u.c"; done
cd "$OUT/src"
DEFS="-DHAVE_DIRENT_H=1 -DHAVE_SYS_DIR_H=0 -DHAVE_SYS_NDIR_H=0 -DHAVE_NDIR_H=0 -DUTIME=1 -DISO_CHAR_SET=1 -DS_IFLNK=-1 -Dlstat=stat -DMEASURE_TIMES=0 -DAGREP_POINTER=1 -DDOTCOMPRESSED=0"
for u in $UNITS; do gcc -c -O2 -w $DEFS "$u.c" -o "$u.o"; done
gcc -o "$OUT/agrep" ./*.o -lm
echo "oracle built: $OUT/agrep"
