"""Nister five-point minimal essential-matrix solver, TPU-native.

Replaces the reference's grafted OpenCV solver (Tracking/
ComputeEssential.cpp:1-10 — Gauss-Jordan + SVD + companion-matrix root
finding) with a from-scratch batched implementation of the published
algorithm (Nister, "An efficient solution to the five-point relative pose
problem", PAMI 2004):

  1. nullspace: E(x,y,z) = x E1 + y E2 + z E3 + E4 from the SVD of the
     5x9 epipolar constraint matrix.
  2. the 10 cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
     expanded over the 20 monomials of degree <= 3 in (x,y,z) by dense
     polynomial arithmetic on (4,4,4) coefficient tensors.
  3. Gauss-Jordan elimination -> three equations B(z) [x, y, 1]^T = 0
     with polynomial entries; det B(z) is the degree-10 polynomial.
  4. real roots WITHOUT an unsymmetric eigensolver (jnp.linalg.eig is
     CPU-only — the constraint that shaped r1-r3's 8-point substitution):
     substitute z = tan(theta) and evaluate the HOMOGENIZED polynomial
     q(theta) = sum_k c_k sin^k cos^(10-k) on a fixed grid — bounded for
     all theta in (-pi/2, pi/2) — then a fixed-iteration bisection on
     each sign-change bracket.  Fully vmappable, fixed shapes.
  5. back-substitute x(z), y(z) from the best-conditioned 2x2 of B(z),
     assemble E, project to the essential manifold.

Each 5-sample yields up to 10 essential matrices (padded, masked).  The
RANSAC wrapper in solvers/essential.py scores them exactly like 8-point
hypotheses; the five-point's value is combinatorial: at inlier ratio r a
minimal sample is all-inlier with probability r^5 vs r^8 — at r = 0.35
that is 23x the hypothesis efficiency (the low-ratio bootstrap gap
measured in tools/debug_init_stress.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_ROOTS = 10
EXTRA_NEWTON = 6  # additional Newton-polished candidates from |q| minima
N_CANDS = MAX_ROOTS + EXTRA_NEWTON
GRID = 1024       # theta-grid resolution for bracketing
BISECT = 40       # fixed bisection iterations per bracket


# ---------------------------------------------------------------------------
# dense polynomial arithmetic in (x, y, z), coefficient tensors c[i,j,k]
# = coeff of x^i y^j z^k
# ---------------------------------------------------------------------------

def _pmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Product of polynomials given as (da+1,..)^3 x (db+1,..)^3 coeff
    tensors; output (da+db+1,)^3.  The leading factor is always small
    (degree <= 2 here) so the unrolled scatter-add is a handful of ops."""
    sa = a.shape[0]
    sb = b.shape[0]
    out = jnp.zeros((sa + sb - 1,) * 3, a.dtype)
    for i in range(sa):
        for j in range(sa):
            for k in range(sa):
                out = out.at[i:i + sb, j:j + sb, k:k + sb].add(
                    a[i, j, k] * b)
    return out


def _entry_poly(E1, E2, E3, E4, m, n) -> jnp.ndarray:
    """Degree-1 coefficient tensor of E(x,y,z)[m,n]."""
    c = jnp.zeros((2, 2, 2), E1.dtype)
    c = c.at[1, 0, 0].set(E1[m, n])
    c = c.at[0, 1, 0].set(E2[m, n])
    c = c.at[0, 0, 1].set(E3[m, n])
    c = c.at[0, 0, 0].set(E4[m, n])
    return c


# the 20 monomials of degree <= 3, Nister's column ordering
_MONOMIALS = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
              (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
              (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
              (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]


def _constraints_matrix(E1, E2, E3, E4) -> jnp.ndarray:
    """(10, 20) coefficient matrix of the ten cubic constraints."""
    e = [[_entry_poly(E1, E2, E3, E4, m, n) for n in range(3)]
         for m in range(3)]

    def p2(a, b):       # degree-2 product
        return _pmul(a, b)

    # det(E): e00 (e11 e22 - e12 e21) - e01 (e10 e22 - e12 e20)
    #         + e02 (e10 e21 - e11 e20)
    det = (_pmul(e[0][0], p2(e[1][1], e[2][2]) - p2(e[1][2], e[2][1]))
           - _pmul(e[0][1], p2(e[1][0], e[2][2]) - p2(e[1][2], e[2][0]))
           + _pmul(e[0][2], p2(e[1][0], e[2][1]) - p2(e[1][1], e[2][0])))

    # EE^T (degree 2, symmetric)
    eet = [[sum(p2(e[m][k], e[n][k]) for k in range(3))
            for n in range(3)] for m in range(3)]
    tr = eet[0][0] + eet[1][1] + eet[2][2]
    # C = EE^T E - 0.5 tr(EE^T) E   (each entry degree 3)
    rows = [det]
    for m in range(3):
        for n in range(3):
            c = sum(_pmul(eet[m][k], e[k][n]) for k in range(3)) \
                - 0.5 * _pmul(tr, e[m][n])
            rows.append(c)

    M = jnp.stack([
        jnp.stack([row[i, j, k] for (i, j, k) in _MONOMIALS])
        for row in rows])
    return M


def _poly_z_parts(r: jnp.ndarray):
    """Trailing-10 coefficients -> (px[3], py[3], pc[4]) z-polynomials
    (ascending z powers).  Trailing order: xz^2 xz x  yz^2 yz y  z^3 z^2
    z 1."""
    px = jnp.stack([r[2], r[1], r[0]])
    py = jnp.stack([r[5], r[4], r[3]])
    pc = jnp.stack([r[9], r[8], r[7], r[6]])
    return px, py, pc


def _conv1(a, b):
    """1-D polynomial product (ascending coeffs)."""
    n = a.shape[0] + b.shape[0] - 1
    out = jnp.zeros(n, a.dtype)
    for i in range(a.shape[0]):
        out = out.at[i:i + b.shape[0]].add(a[i] * b)
    return out


def five_point_polynomial(xn0: jnp.ndarray, xn1: jnp.ndarray):
    """From 5 normalized correspondences: the degree-10 polynomial (11
    ascending coeffs) plus the B(z) entry polynomials needed for
    back-substitution.  Returns (poly11, Bx (3,4), By (3,4), Bc (3,5),
    E_basis (4,3,3))."""
    x0, y0 = xn0[:, 0], xn0[:, 1]
    x1, y1 = xn1[:, 0], xn1[:, 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, ones], -1)                        # (5, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[5:9]                                          # (4, 9)
    E1, E2, E3, E4 = (basis[i].reshape(3, 3) for i in range(4))

    M = _constraints_matrix(E1, E2, E3, E4)                  # (10, 20)
    # row normalization (the constraint rows differ by orders of
    # magnitude; f32 elimination needs the balance), then Gauss-Jordan
    # via solve with a tiny diagonal regularizer against degenerate
    # configurations
    M = M / jnp.maximum(jnp.max(jnp.abs(M), axis=1, keepdims=True),
                        1e-30)
    lead = M[:, :10]
    lead = lead + 1e-10 * jnp.eye(10, dtype=M.dtype)
    B = jnp.linalg.solve(lead, M[:, 10:])                    # (10, 10)

    def eq(row_z, row_1):
        """row_z - z * row_1, as (px, py, pc) z-polys."""
        ax, ay, ac = _poly_z_parts(B[row_z])
        bx, by, bc = _poly_z_parts(B[row_1])
        Bx = jnp.concatenate([ax, jnp.zeros(1, ax.dtype)]) \
            - jnp.concatenate([jnp.zeros(1, bx.dtype), bx])
        By = jnp.concatenate([ay, jnp.zeros(1, ay.dtype)]) \
            - jnp.concatenate([jnp.zeros(1, by.dtype), by])
        Bc = jnp.concatenate([ac, jnp.zeros(1, ac.dtype)]) \
            - jnp.concatenate([jnp.zeros(1, bc.dtype), bc])
        return Bx, By, Bc

    e1 = eq(4, 5)    # x^2 z / x^2
    e2 = eq(6, 7)    # y^2 z / y^2
    e3 = eq(8, 9)    # xyz / xy
    Bx = jnp.stack([e1[0], e2[0], e3[0]])    # (3, 4)
    By = jnp.stack([e1[1], e2[1], e3[1]])    # (3, 4)
    Bc = jnp.stack([e1[2], e2[2], e3[2]])    # (3, 5)

    # det B(z): expansion along the first row-triple
    def minor(i, j):
        return _conv1(By[i], Bc[j]) - _conv1(By[j], Bc[i])   # (8,)

    p = (_conv1(Bx[0], minor(1, 2)) - _conv1(Bx[1], minor(0, 2))
         + _conv1(Bx[2], minor(0, 1)))                       # (11,)
    return p, Bx, By, Bc, jnp.stack([E1, E2, E3, E4])


def _eval_homogeneous(p: jnp.ndarray, s: jnp.ndarray, c: jnp.ndarray):
    """q = sum_k p[k] s^k c^(D-k) — the homogenized evaluation of p at
    z = s/c, bounded for all angles."""
    D = p.shape[0] - 1
    ks = jnp.arange(D + 1)
    return jnp.sum(p * s[..., None] ** ks * c[..., None] ** (D - ks), -1)


def real_roots_deg10(p: jnp.ndarray):
    """Up to N_CANDS real-root candidates of the degree-10 polynomial
    (ascending 11 coeffs): sign-change brackets refined by fixed
    bisection, PLUS Newton-polished candidates seeded at the smallest-|q|
    grid minima — the latter recover close root PAIRS that fall inside
    one grid cell and never flip the sign (measured failure mode:
    two roots 0.1 apart at z = -10.7 lost by bracketing alone).
    Returns (roots (N_CANDS,), valid (N_CANDS,) bool); candidates are a
    SUPERSET of the real roots — callers must score/validate downstream
    (RANSAC does)."""
    p = p / jnp.maximum(jnp.max(jnp.abs(p)), 1e-30)
    th = jnp.linspace(-jnp.pi / 2 + 1e-4, jnp.pi / 2 - 1e-4, GRID)
    q = _eval_homogeneous(p, jnp.sin(th), jnp.cos(th))
    sgn = jnp.sign(q)
    change = (sgn[:-1] * sgn[1:]) < 0                        # (GRID-1,)
    # pick the first MAX_ROOTS bracket indices deterministically
    idx_score = jnp.where(change, GRID - jnp.arange(GRID - 1), 0)
    _, bidx = jax.lax.top_k(idx_score, MAX_ROOTS)
    bvalid = change[bidx]
    lo = th[bidx]
    hi = th[bidx + 1]

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        qlo = _eval_homogeneous(p, jnp.sin(lo), jnp.cos(lo))
        qmid = _eval_homogeneous(p, jnp.sin(mid), jnp.cos(mid))
        same = jnp.sign(qlo) == jnp.sign(qmid)
        return (jnp.where(same, mid, lo), jnp.where(same, hi, mid)), None

    (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=BISECT)
    roots = jnp.tan(0.5 * (lo + hi))

    # Newton candidates from |q| local minima (close-pair rescue)
    absq = jnp.abs(q)
    is_min = jnp.pad((absq[1:-1] <= absq[:-2])
                     & (absq[1:-1] <= absq[2:]), (1, 1))
    min_score = jnp.where(is_min, -absq, -jnp.inf)
    _, midx = jax.lax.top_k(min_score, EXTRA_NEWTON)
    thn = th[midx]
    dcoef = p[1:] * jnp.arange(1, p.shape[0], dtype=p.dtype)

    def newton(thk, _):
        z = jnp.tan(thk)
        num = _eval1(p, z)
        den = _eval1(dcoef, z)
        den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        z2 = z - num / den
        z2 = jnp.clip(z2, -1e6, 1e6)
        return jnp.arctan(z2), None

    thn, _ = jax.lax.scan(newton, thn, None, length=24)
    zn = jnp.tan(thn)
    # accept only converged candidates (relative residual)
    qn = _eval_homogeneous(p, jnp.sin(thn), jnp.cos(thn))
    nvalid = jnp.abs(qn) < 1e-4

    roots = jnp.concatenate([roots, zn])
    valid = jnp.concatenate([bvalid & jnp.isfinite(roots[:MAX_ROOTS]),
                             nvalid & jnp.isfinite(zn)])
    return roots, valid


def _eval1(poly: jnp.ndarray, z: jnp.ndarray):
    """Evaluate ascending-coeff poly at z (Horner)."""
    acc = jnp.zeros_like(z)
    for c in poly[::-1]:
        acc = acc * z + c
    return acc


@jax.jit
def five_point_essential(xn0: jnp.ndarray, xn1: jnp.ndarray):
    """Essential-matrix candidates from 5 correspondences.

    Returns (Es (N_CANDS, 3, 3), valid (N_CANDS,)) — one candidate per
    real-root candidate of the degree-10 polynomial (a superset: callers
    score them; RANSAC does exactly that)."""
    p, Bx, By, Bc, basis = five_point_polynomial(xn0, xn1)
    roots, rvalid = real_roots_deg10(p)

    def solve_xy(z):
        bx = jax.vmap(lambda r: _eval1(r, z))(Bx)    # (3,)
        by = jax.vmap(lambda r: _eval1(r, z))(By)
        bc = jax.vmap(lambda r: _eval1(r, z))(Bc)
        # best-conditioned 2x2 among the 3 row pairs
        pairs = jnp.array([[0, 1], [0, 2], [1, 2]])
        dets = bx[pairs[:, 0]] * by[pairs[:, 1]] \
            - bx[pairs[:, 1]] * by[pairs[:, 0]]
        b = jnp.argmax(jnp.abs(dets))
        i, j = pairs[b, 0], pairs[b, 1]
        det = dets[b]
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x = (-bc[i] * by[j] + bc[j] * by[i]) / det
        y = (-bx[i] * bc[j] + bx[j] * bc[i]) / det
        return x, y

    xs, ys = jax.vmap(solve_xy)(roots)
    Es = (xs[:, None, None] * basis[0] + ys[:, None, None] * basis[1]
          + roots[:, None, None] * basis[2] + basis[3])

    def project(E):
        U, _, Vt = jnp.linalg.svd(E)
        return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt

    Es = jax.vmap(project)(Es)
    ok = rvalid & jnp.all(jnp.isfinite(Es), axis=(1, 2))
    # self-consistency: a genuine solution zeroes the epipolar constraint
    # on its own 5 samples (defining property); spurious Newton-minima
    # candidates fail this and are filtered here instead of wasting
    # scoring work downstream.  |E|_F = sqrt(2) after projection, so the
    # residual scale is comparable across candidates.
    h0 = jnp.concatenate([xn0, jnp.ones((5, 1), xn0.dtype)], -1)
    h1 = jnp.concatenate([xn1, jnp.ones((5, 1), xn1.dtype)], -1)
    res = jnp.einsum('ni,cij,nj->cn', h1, Es, h0)
    ok &= jnp.max(jnp.abs(res), axis=1) < 5e-3
    return Es, ok
