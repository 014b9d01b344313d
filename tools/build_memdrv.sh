#!/bin/bash
# Build a memagrep(3) driver against the reference objects: the oracle
# for the LIBRARY buffer API (SURVEY L6).  Reads the search buffer from
# stdin, takes agrep options+pattern as argv, writes matches to stdout,
# exits with the match count (mod 256) or 255 on error -- mirroring the
# CLI contract so tests can byte-diff both sinks.
set -e
OUT=$(cd "$(dirname "$0")/.." && pwd)/.oracle
[ -x "$OUT/agrep" ] || "$(dirname "$0")/build_oracle.sh"
cat > "$OUT/src/memdrv.c" <<'EOC'
#include <stdio.h>
#include <stdlib.h>
extern int memagrep();
int main(int argc, char *argv[]) {
    static char buf[1 << 22];
    int n = (int)fread(buf, 1, sizeof(buf) - 4096, stdin);
    int r = memagrep(argc, argv, n, buf, 0, stdout);
    fflush(stdout);
    if (r < 0) return 255;
    return r & 0xFF;
}
EOC
cd "$OUT/src"
gcc -O2 -w -c memdrv.c -o memdrv.o
OBJS=$(ls *.o | grep -v '^main\.o$' | grep -v '^memdrv\.o$')
gcc -o "$OUT/memdrv" memdrv.o $OBJS -lm
echo "memagrep driver built: $OUT/memdrv"
