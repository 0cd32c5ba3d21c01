#!/usr/bin/env python3
"""Independent textbook implementations (sort-based ranks, brute-force
pair counts) of the statistics the engine computes with value-grouped
distributed algebra. Run to regenerate the golden vectors pinned in
StatsTestsSpec/EvalSpec ("golden vectors from tools/golden_stats.py") --
a third implementation that would catch a formula error mirrored into
both the Spark side and the DuckDB oracle SQL (r12 advice #3).
Stdlib only; driver-side dev tool, not an engine dependency."""
import math

def ranks(vals):
    # tie-averaged ranks, textbook via sorting
    s = sorted((v, i) for i, v in enumerate(vals))
    r = [0.0]*len(vals)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j][0] == s[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0   # average of ranks i+1..j
        for k in range(i, j):
            r[s[k][1]] = avg
        i = j
    return r

def mann_whitney(a, b):
    allv = a + b
    r = ranks(allv)
    n1, n2 = len(a), len(b)
    R1 = sum(r[:n1])
    U1 = R1 - n1*(n1+1)/2
    N = n1+n2
    # tie correction
    from collections import Counter
    tie = sum(t**3 - t for t in Counter(allv).values())
    var = n1*n2/12.0 * ((N+1) - tie/(N*(N-1)))
    z = (U1 - n1*n2/2.0)/math.sqrt(var)
    return U1, z

def wilcoxon(diffs):
    d = [x for x in diffs if x != 0]
    n = len(d)
    r = ranks([abs(x) for x in d])
    wplus = sum(ri for ri, di in zip(r, d) if di > 0)
    from collections import Counter
    tie = sum(t**3 - t for t in Counter(abs(x) for x in d).values())
    var = (n*(n+1)*(2*n+1) - tie/2.0)/24.0
    z = (wplus - n*(n+1)/4.0)/math.sqrt(var)
    return n, wplus, z

def roc_auc(pairs):  # (score,label)
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    # textbook: P(pos>neg) + 0.5 P(=)
    tot = 0.0
    for p in pos:
        for q in neg:
            tot += 1.0 if p > q else (0.5 if p == q else 0.0)
    return tot/(len(pos)*len(neg))

def ks(a, b):
    vals = sorted(set(a+b))
    d = 0.0
    for v in vals:
        f1 = sum(1 for x in a if x <= v)/len(a)
        f2 = sum(1 for x in b if x <= v)/len(b)
        d = max(d, abs(f1-f2))
    return d

def mann_kendall(vals):
    n = len(vals)
    S = 0
    for i in range(n):
        for j in range(i+1, n):
            S += (vals[j] > vals[i]) - (vals[j] < vals[i])
    from collections import Counter
    tie = sum(t*(t-1)*(2*t+5) for t in Counter(vals).values())
    var = (n*(n-1)*(2*n+5) - tie)/18.0
    z = (S-1)/math.sqrt(var) if S > 0 else ((S+1)/math.sqrt(var) if S < 0 else 0.0)
    p = math.erfc(abs(z)/math.sqrt(2))
    return S, var, z, p

def spearman(a, b):
    ra, rb = ranks(a), ranks(b)
    n = len(a)
    ma = sum(ra)/n; mb = sum(rb)/n
    cov = sum((x-ma)*(y-mb) for x, y in zip(ra, rb))
    va = sum((x-ma)**2 for x in ra); vb = sum((y-mb)**2 for y in rb)
    return cov/math.sqrt(va*vb)

A = [1.0, 2.0, 2.0, 3.0, 5.0]
B = [2.0, 3.0, 3.0, 4.0]
print("mannWhitney U1,z:", mann_whitney(A, B))
D = [1.5, -2.0, 3.0, 4.0, -1.5, 2.0, 5.0, -2.0]
print("wilcoxon n,w+,z:", wilcoxon(D))
P = [(0.9, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0), (0.5, 1), (0.4, 0), (0.3, 1)]
print("rocAuc:", roc_auc(P))
print("ks:", ks(A, B))
MK = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
print("mannKendall S,var,z,p:", mann_kendall(MK))
SA = [1.0, 2.0, 2.0, 4.0, 5.0]
SB = [2.0, 1.0, 3.0, 3.0, 5.0]
print("spearman:", spearman(SA, SB))
