"""Help and version output (reference agrephlp.c:75-295).

The reference shows a six-page interactive help; page one is the
canonical option list, reproduced here (our banner differs: the
reference embeds its compile date, which can never be byte-stable)."""

from .version import __version__, REFERENCE_VERSION

BANNER = ("AGREP-TPU %s (capability surface of %s). "
          "Wu/Manber bit-parallel matching, TPU-native rebuild."
          % (__version__, REFERENCE_VERSION))

USAGE_PAGE = """
           Approximate Pattern Matching GREP -- Get Regular Expression
Usage:
AGREP [-#cdehi[a|#]klnprstvwxyABDGIMSV] [-f patternfile] [-H dir] pattern [files]
-#  find matches with at most # errors     -A  always output filenames
-b  print byte offset of match
-c  output the number of matched records   -B  find best match to the pattern
-d  define record delimiter                -D  set cost of deletions
-e  for use when pattern begins with -
-f  name of file containing patterns       -G  output the files with a match
-h  do not output file names               -H  directory for the dictionaries
-i  case-insensitive search; ISO <-> ASCII -I  set cost of insertions
-k  treat pattern literally
-l  output the names of files with a match -L  limit number of outputs
-n  output record prefixed by record number
-p  supersequence search                   -M  output multiple matches per record
-q  print buffer byte offsets
-r  recurse into subdirectories            -S  set cost of substitutions
-s  silent mode
-t  output record tail after delimiter     -V  version / verbosity -V0..-V5
-v  output non-matching records
-w  match whole words
-x  match whole lines                      -y  suppress the prompt for -B
-z  do not output files with 0 matches     -CP codepage (437, 850, 8859)
"""


def print_version() -> None:
    print()
    print(BANNER)


def print_usage(out=None) -> None:
    import sys
    f = out or sys.stderr
    print(BANNER, file=f)
    print(USAGE_PAGE, file=f)
