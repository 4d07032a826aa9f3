"""Derive the Karney (2013) geodesic series coefficients with sympy.

One-off build tool: derives A1/C1/C1'/A2/C2/A3/C3 expansions from the
geodesic integrals (Karney, "Algorithms for geodesics", J. Geodesy 2013,
eqs. 15-25) and prints them as python polynomial tables that are
hardcoded (after verification against pyproj's published golden test
values) into ``pyproj_spark/kernels/geodesic.py``.

Fourier collection is done in the z = exp(I*sigma) domain to stay exact
and fast (no simplify/fu).

Run: python tools/derive_geodesic_series.py
"""

import sympy as sp

ORDER = 6
eps, n = sp.symbols("eps n", real=True)
sigma, tau = sp.symbols("sigma tau", real=True)
I = sp.I

# k2 in terms of eps:  eps = (sqrt(1+k2)-1)/(sqrt(1+k2)+1)
k2 = 4 * eps / (1 - eps) ** 2


def fourier_dict(expr, var):
    """expr (poly in sin/cos of multiples of var, coeffs in eps[,n]) ->
    {m: coeff of exp(I m var)} exact."""
    z = sp.symbols("zzz")
    e = expr.rewrite(sp.exp).subs(sp.exp(I * var), z)
    e = sp.expand(sp.radsimp(e))
    e = sp.together(e)
    num, den = sp.fraction(e)
    num = sp.expand(num)
    # den should be z**k * const
    dpoly = sp.Poly(den, z)
    if len(dpoly.monoms()) != 1:
        raise ValueError(f"unexpected denominator {den}")
    (dm,) = dpoly.monoms()
    dc = dpoly.coeffs()[0]
    out = {}
    npoly = sp.Poly(num, z)
    for mono, c in zip(npoly.monoms(), npoly.coeffs()):
        m = mono[0] - dm[0]
        out[m] = out.get(m, 0) + sp.expand(c / dc)
    return out


def integrate_fourier(fd, var):
    """Integrate sum c_m exp(I m var) from 0 to var -> (secular, {l: sin coeff}).

    Assumes even real function: c_m == c_{-m}; integral = c_0*var +
    sum_{m>0} (c_m/m) * 2 sin(m var)."""
    secular = sp.expand(fd.get(0, 0))
    sines = {}
    for m, c in fd.items():
        if m > 0:
            sines[m] = sp.expand(2 * c / (I * m) * I)  # = 2*c/m
    return secular, sines


def ser_eps(expr, order=ORDER):
    return sp.series(sp.expand(expr), eps, 0, order + 1).removeO()


def poly_str(expr, vars_):
    return str(sp.nsimplify(sp.expand(expr)))


def derive_I(f, order=ORDER):
    ser = ser_eps(f, order)
    fd = fourier_dict(ser, sigma)
    secular, sines = integrate_fourier(fd, sigma)
    A = ser_eps(secular, order)
    C = {}
    for ll in range(1, order + 1):
        c = sines.get(2 * ll, 0)
        C[ll] = ser_eps(sp.cancel(c / A), order)
    return A, C


def main():
    # ---- I1: ds = b * sqrt(1 + k2 sin^2 sigma) dsigma
    A1, C1 = derive_I(sp.sqrt(1 + k2 * sp.sin(sigma) ** 2))
    print("A1 =", poly_str(A1, eps))
    for ll, c in C1.items():
        print(f"C1[{ll}] =", poly_str(c, eps))

    # ---- C1': reversion of tau = sigma + sum C1l sin(2 l sigma)
    # iterate sigma = tau - sum C1l sin(2 l sigma)
    sig = tau
    for _ in range(ORDER):
        expr = tau - sum(C1[ll] * sp.sin(2 * ll * sig) for ll in range(1, ORDER + 1))
        sig = sp.series(sp.expand(expr), eps, 0, ORDER + 1).removeO()
        # reduce products of trig back to multiple angles via z-domain
        fd = fourier_dict(sig - tau, tau)
        sig = tau + sum(
            c * sp.exp(I * m * tau) for m, c in fd.items()
        ).rewrite(sp.cos)
        sig = sp.expand(ser_eps(sig))
    fd = fourier_dict(sig - tau, tau)
    print()
    for ll in range(1, ORDER + 1):
        c = fd.get(2 * ll, 0) + fd.get(-2 * ll, 0)  # sin coeff: (c+ - c-)*I... handle below
        cp = fd.get(2 * ll, 0)
        cm = fd.get(-2 * ll, 0)
        sin_c = sp.expand(I * (cm - cp))  # exp form: a*exp + b*exp(-) = (a+b)cos + i(a-b)sin
        print(f"C1p[{ll}] =", poly_str(ser_eps(sin_c), eps))

    # ---- I2: 1/sqrt(1 + k2 sin^2 sigma)
    A2, C2 = derive_I(1 / sp.sqrt(1 + k2 * sp.sin(sigma) ** 2))
    print()
    print("A2 =", poly_str(A2, eps))
    for ll, c in C2.items():
        print(f"C2[{ll}] =", poly_str(c, eps))

    # ---- I3: (2 - f)/(1 + (1 - f) sqrt(1 + k2 sin^2 sigma)), f = 2n/(1+n)
    f = 2 * n / (1 + n)
    f3 = (2 - f) / (1 + (1 - f) * sp.sqrt(1 + k2 * sp.sin(sigma) ** 2))
    ser = sp.series(f3, eps, 0, ORDER).removeO()
    # expand each eps-coefficient in n as well
    ser = sp.expand(sp.series(sp.expand(ser), n, 0, ORDER).removeO())
    fd = fourier_dict(ser, sigma)
    secular, sines = integrate_fourier(fd, sigma)

    def trunc(e, omax):
        e = sp.expand(e)
        out = 0
        for t in sp.Add.make_args(e):
            if sp.degree(t, eps) + sp.degree(t, n) <= omax:
                out += t
        return out

    A3 = trunc(secular, ORDER - 1)
    print()
    print("A3 =", poly_str(A3, (eps, n)))
    for ll in range(1, ORDER):
        c = sines.get(2 * ll, 0)
        c = sp.series(sp.cancel(sp.together(c) / sp.together(A3)), eps, 0, ORDER).removeO()
        c = sp.expand(sp.series(sp.expand(c), n, 0, ORDER).removeO())
        print(f"C3[{ll}] =", poly_str(trunc(c, ORDER - 1), (eps, n)))


if __name__ == "__main__":
    main()
