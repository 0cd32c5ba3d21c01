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

# ---- round-13 additions: the r12 stats families ----------------------

def kruskal(groups):
    # textbook H with tie-averaged ranks over the pooled sample
    allv = [v for g in groups for v in g]
    r = ranks(allv)
    N = len(allv)
    H = 0.0
    i = 0
    for g in groups:
        Rg = sum(r[i:i+len(g)])
        H += Rg*Rg/len(g)
        i += len(g)
    H = 12.0/(N*(N+1))*H - 3*(N+1)
    from collections import Counter
    tie = sum(t**3 - t for t in Counter(allv).values())
    corr = 1.0 - tie/(N**3 - N)
    return H, (H/corr if corr != 0 else None)


def rank_no_ties(vals):
    # row_number-style ranks by (value, position) — the engine's
    # (metric, id) tiebreak, NOT tie-averaged
    s = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    r = [0]*len(vals)
    for rank0, i in enumerate(s):
        r[i] = rank0 + 1
    return r


def kendall_w_friedman(judges):
    # judges: list of k lists, each ranking the same n subjects
    k = len(judges)
    n = len(judges[0])
    R = [sum(rank_no_ties(j)[i] for j in judges) for i in range(n)]
    S = sum((Ri - k*(n+1)/2.0)**2 for Ri in R)
    W = 12.0*S/(k*k*(n**3 - n))
    chi2 = k*(n-1)*W
    return W, chi2


def anova_f(groups):
    allv = [v for g in groups for v in g]
    N = len(allv)
    k = len(groups)
    gm = sum(allv)/N
    ssb = sum(len(g)*(sum(g)/len(g) - gm)**2 for g in groups)
    ssw = sum((v - sum(g)/len(g))**2 for g in groups for v in g)
    f = (ssb/(k-1))/(ssw/(N-k)) if ssw > 0 else None
    return ssb, ssw, f


def brown_forsythe(groups):
    # z = |v - lower median| (percentile_disc at ceil(n/2))
    def lower_median(g):
        s = sorted(g)
        return s[max(math.ceil(0.5*len(g)), 1) - 1]
    return anova_f([[abs(v - lower_median(g)) for v in g]
                    for g in groups])


def jarque_bera(vals):
    n = len(vals)
    mu = sum(vals)/n
    m2 = sum((v-mu)**2 for v in vals)/n
    m3 = sum((v-mu)**3 for v in vals)/n
    m4 = sum((v-mu)**4 for v in vals)/n
    g1 = m3/m2**1.5
    g2 = m4/m2**2 - 3
    jb = n/6.0*(g1*g1 + g2*g2/4.0)
    return g1, g2, jb, math.exp(-jb/2.0)


def ljung_box(vals, maxlag):
    n = len(vals)
    mu = sum(vals)/n
    den = sum((v-mu)**2 for v in vals)
    out = []
    q = 0.0
    for kk in range(1, maxlag+1):
        r = sum((vals[t]-mu)*(vals[t-kk]-mu)
                for t in range(kk, n))/den
        q += r*r/(n-kk)
        out.append((kk, r, n*(n+2)*q))
    return out


def km_na(spans, horizon):
    # spans: [(first,last)] in buckets; churned iff last <= max - horizon
    maxd = max(l for _, l in spans)
    rows = [(l-f, 1 if l <= maxd-horizon else 0) for f, l in spans]
    from collections import defaultdict
    ends = defaultdict(int)
    churn = defaultdict(int)
    for t, ch in rows:
        ends[t] += 1
        churn[t] += ch
    surv = 1.0
    H = 0.0
    curve = []
    at_risk = len(rows)
    for t in sorted(ends):
        d = churn[t]
        if d > 0:
            surv *= (at_risk - d)/at_risk
            H += d/at_risk
            curve.append((t, at_risk, d, ends[t]-d, surv, d/at_risk, H))
        at_risk -= ends[t]
    return curve


def log_rank(spans_a, spans_b, horizon):
    both = [(f, l, 1) for f, l in spans_a] + \
           [(f, l, 2) for f, l in spans_b]
    maxd = max(l for _, l, _ in both)
    rows = [(l-f, g, 1 if l <= maxd-horizon else 0) for f, l, g in both]
    from collections import defaultdict
    ends = defaultdict(lambda: [0, 0])
    churn = defaultdict(lambda: [0, 0])
    for t, g, ch in rows:
        ends[t][g-1] += 1
        churn[t][g-1] += ch
    n1 = sum(1 for _, g, _ in rows if g == 1)
    n2 = len(rows) - n1
    o1 = e1 = v = 0.0
    for t in sorted(ends):
        d1, d2 = churn[t]
        d = d1 + d2
        n = n1 + n2
        if d > 0:
            o1 += d1
            e1 += d*n1/n
            if n > 1:
                v += d*(n1/n)*(n2/n)*(n-d)/(n-1)
        n1 -= ends[t][0]
        n2 -= ends[t][1]
    chi2 = (o1-e1)**2/v if v > 0 else None
    return o1, e1, v, chi2


def cuped(rows):
    # rows: (arm_bool, x, y); theta from POOLED raw second moments
    n = len(rows)
    sx = sum(x for _, x, _ in rows); sy = sum(y for _, _, y in rows)
    sxx = sum(x*x for _, x, _ in rows)
    sxy = sum(x*y for _, x, y in rows)
    syy = sum(y*y for _, _, y in rows)
    cov = n*sxy - sx*sy
    varx = n*sxx - sx*sx
    vary = n*syy - sy*sy
    theta = cov/varx
    rho2 = cov*cov/(varx*vary)
    a = [(x, y) for arm, x, y in rows if arm]
    b = [(x, y) for arm, x, y in rows if not arm]
    mxa = sum(x for x, _ in a)/len(a); mya = sum(y for _, y in a)/len(a)
    mxb = sum(x for x, _ in b)/len(b); myb = sum(y for _, y in b)/len(b)
    diff = mya - myb
    return theta, rho2, diff, diff - theta*(mxa - mxb)


def tost(na, ca, nb, cb, margin):
    pa, pb = ca/na, cb/nb
    se = math.sqrt(pa*(1-pa)/na + pb*(1-pb)/nb)
    diff = pa - pb
    zc = 1.6448536269514722
    return (diff, se, (diff+margin)/se, (margin-diff)/se,
            (diff+margin)/se > zc and (margin-diff)/se > zc)


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

G1 = [1.0, 2.0, 2.0, 5.0]
G2 = [3.0, 4.0, 4.0]
G3 = [2.0, 6.0, 7.0, 8.0]
print("kruskal H,Hc:", kruskal([G1, G2, G3]))
print("anovaF ssb,ssw,f:", anova_f([G1, G2, G3]))
print("brownForsythe ssb,ssw,f:", brown_forsythe([G1, G2, G3]))
# 3 judges score 4 subjects; subject i's metric-j value below —
# distinct within each judge so row_number == tie-averaged rank
J = [[0.9, 0.4, 0.7, 0.1],
     [0.8, 0.5, 0.6, 0.2],
     [0.3, 0.9, 0.8, 0.1]]
print("kendallW W, friedman chi2:", kendall_w_friedman(J))
JB = [1.0, 2.0, 2.5, 3.0, 10.0, 2.2, 1.8, 2.9]
print("jarqueBera g1,g2,jb,p:", jarque_bera(JB))
LB = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0]
print("ljungBox (lag,r,q):", ljung_box(LB, 3))
SP = [(0, 10), (0, 6), (1, 9), (2, 6), (0, 3), (3, 6), (2, 10),
      (1, 4), (0, 2), (5, 6)]
print("km/na (t,n,d,c,surv,h,H):")
for row in km_na(SP, 2):
    print("  ", row)
SPB = [(0, 9), (1, 5), (0, 10), (2, 4), (1, 3), (0, 7), (4, 10)]
print("logRank o1,e1,v,chi2:", log_rank(SP, SPB, 2))
CU = [(True, 10.0, 12.0), (True, 8.0, 9.5), (True, 12.0, 13.0),
      (False, 9.0, 10.0), (False, 11.0, 11.5), (False, 7.0, 8.0)]
print("cuped theta,rho2,diff,diff_cuped:", cuped(CU))
print("tost:", tost(400, 120, 500, 145, 0.05))
