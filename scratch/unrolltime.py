"""Honest: rolled vs unrolled z-loop megastep chain at 64k, k=8 m=16."""
import sys
sys.path.insert(0, "/root/repo")
exec(open('/root/repo/scratch/leantime.py').read().split("for half in")[0])
for unroll in (False, True):
    honest(make_chain(8, 16, False, unroll), 128,
           f"k=8 m=16 full unroll={unroll}")
