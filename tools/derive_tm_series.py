"""Derive the Krüger transverse-Mercator series (order 6 in n) with sympy.

Produces the alpha (forward) / beta (inverse) coefficients of the exact
transverse Mercator method (Karney, "Transverse Mercator with an
accuracy of a few nanometers", J. Geodesy 2011; originally Krüger 1912),
plus the rectifying radius A.  alpha/beta relate the Gauss-Schreiber
(conformal-sphere TM) complex coordinate zeta' to the TM coordinate
zeta:

    zeta  = zeta' + sum alpha_j sin(2 j zeta')
    zeta' = zeta  - sum beta_j  sin(2 j zeta)

alpha_j equals the Fourier coefficients of the rectifying latitude mu
expressed in terms of the conformal latitude chi (analytic
continuation), which is what we derive here.

Run: python tools/derive_tm_series.py
"""

import sympy as sp

ORDER = 6
n, phi, e = sp.symbols("n phi e", positive=True)
I = sp.I


def fourier_sin_coeffs(expr, var, order_n):
    """expr = sum c_j sin(2 j var) (+ possibly var term handled outside);
    return {j: c_j} via the z-domain, with coefficients series in n."""
    z = sp.symbols("zf")
    ee = expr.rewrite(sp.exp).subs(sp.exp(I * var), z)
    ee = sp.expand(sp.cancel(sp.together(ee)))
    num, den = sp.fraction(sp.together(ee))
    num = sp.expand(num)
    dpoly = sp.Poly(den, z)
    (dm,) = dpoly.monoms()
    dc = dpoly.coeffs()[0]
    out = {}
    for mono, c in zip(sp.Poly(num, z).monoms(), sp.Poly(num, z).coeffs()):
        m = mono[0] - dm[0]
        out[m] = out.get(m, 0) + c / dc
    sines = {}
    for j in range(1, ORDER + 1):
        cp = sp.expand(out.get(2 * j, 0))
        cm = sp.expand(out.get(-2 * j, 0))
        sines[j] = sp.expand(sp.series(sp.expand(I * (cp - cm)), n, 0,
                                       order_n + 1).removeO())
    return sines


def trig_reduce_to_sines(expr, var, order_n):
    """Series-in-n trig polynomial -> (secular coeff of var, sine dict)."""
    # expr assumed odd periodic plus possibly linear term already removed
    return fourier_sin_coeffs(expr, var, order_n)


def main():
    e2 = 4 * n / (1 + n) ** 2

    # ---- conformal latitude chi(phi), series in n
    s = sp.sin(phi)
    # tanh(e * atanh(e * s)) expanded in e (even powers only), then e->n
    x = sp.symbols("x")  # placeholder for e*atanh(e*s)
    T_e = sp.tanh(e * sp.atanh(e * s))
    T = sp.series(T_e, e, 0, 2 * ORDER + 2).removeO()
    sinchi = (s - T) / (1 - s * T)
    chi = sp.asin(sinchi)
    chi_m_phi = sp.series(sp.expand(chi - phi), e, 0, 2 * ORDER + 2).removeO()
    chi_m_phi = chi_m_phi.subs(e, 2 * sp.sqrt(n) / (1 + n))
    chi_m_phi = sp.expand(sp.series(sp.expand(chi_m_phi), sp.sqrt(n), 0,
                                    2 * ORDER + 1).removeO())
    chi_sines = fourier_sin_coeffs(chi_m_phi, phi, ORDER)
    print("# chi(phi) = phi + sum c_j sin(2 j phi)   [geodetic->conformal]")
    for j, c in chi_sines.items():
        print(f"CHI[{j}] =", sp.nsimplify(c))

    # ---- rectifying latitude mu(phi), series in n
    integrand = (1 - e2) / (1 - e2 * sp.sin(phi) ** 2) ** sp.Rational(3, 2)
    ser = sp.expand(sp.series(integrand, n, 0, ORDER + 1).removeO())
    # Fourier: integrand is even trig polynomial -> integrate termwise
    z = sp.symbols("zz")
    eee = ser.rewrite(sp.exp).subs(sp.exp(I * phi), z)
    eee = sp.expand(sp.cancel(sp.together(eee)))
    num, den = sp.fraction(sp.together(eee))
    dpoly = sp.Poly(den, z)
    (dm,) = dpoly.monoms()
    dc = dpoly.coeffs()[0]
    terms = {}
    for mono, c in zip(sp.Poly(sp.expand(num), z).monoms(),
                       sp.Poly(sp.expand(num), z).coeffs()):
        m = mono[0] - dm[0]
        terms[m] = terms.get(m, 0) + c / dc
    m0 = sp.expand(terms.get(0, 0))            # secular rate
    mu_sines = {}
    for j in range(1, ORDER + 1):
        cp = terms.get(2 * j, 0)
        # integral of c (exp(2ij phi)+exp(-2ij phi)) = c/j sin(2j phi)... for
        # even real: coeff of sin = 2*cp/(2j) * ... (see geodesic derivation)
        mu_sines[j] = sp.expand(sp.series(sp.expand(cp / j), n, 0,
                                          ORDER + 1).removeO())
    # mu = (m(phi)/m(pi/2)) * pi/2: m(phi) = m0*phi + sum (mu_sines_j) sin 2j phi
    # m(pi/2) = m0*pi/2  (sines vanish)
    print("\n# rectifying: mu = phi + sum d_j sin(2 j phi), after normalizing")
    A_over_a = sp.expand(sp.series(sp.expand(m0 * (1 + n)), n, 0,
                                   ORDER + 1).removeO())
    print("A = a/(1+n) *", sp.nsimplify(A_over_a))
    d_sines = {j: sp.expand(sp.series(sp.cancel(c / m0), n, 0, ORDER + 1)
                            .removeO()) for j, c in mu_sines.items()}
    for j, c in d_sines.items():
        print(f"D[{j}] =", sp.nsimplify(c))

    # ---- invert chi(phi) -> phi(chi) by iteration (like C1p derivation)
    chivar = sp.symbols("chiv")
    ph = chivar
    for _ in range(ORDER):
        corr = chivar - (ph + sum(c * sp.sin(2 * j * ph)
                                  for j, c in chi_sines.items()))
        ph = sp.expand(sp.series(sp.expand(ph + corr), sp.sqrt(n), 0,
                                 2 * ORDER + 1).removeO())
        sines = fourier_sin_coeffs(ph - chivar, chivar, ORDER)
        ph = chivar + sum(c * sp.sin(2 * j * chivar)
                          for j, c in sines.items())
    phi_of_chi = fourier_sin_coeffs(ph - chivar, chivar, ORDER)
    print("\n# phi(chi) = chi + sum p_j sin(2 j chi)  [conformal->geodetic]")
    for j, c in phi_of_chi.items():
        print(f"PHI[{j}] =", sp.nsimplify(c))

    # ---- alpha: mu(phi(chi)) = chi + sum alpha_j sin(2 j chi)
    expr = ph + sum(c * sp.sin(2 * j * ph) for j, c in d_sines.items())
    expr = sp.expand(sp.series(sp.expand(expr), sp.sqrt(n), 0,
                               2 * ORDER + 1).removeO())
    alpha = fourier_sin_coeffs(expr - chivar, chivar, ORDER)
    print("\n# alpha (forward TM)")
    for j, c in alpha.items():
        print(f"ALPHA[{j}] =", sp.nsimplify(c))

    # ---- beta: invert mu-series: chi = mu - sum beta_j sin(2 j mu)
    muvar = sp.symbols("muv")
    ch = muvar
    for _ in range(ORDER):
        corr = muvar - (ch + sum(c * sp.sin(2 * j * ch)
                                 for j, c in alpha.items()))
        ch = sp.expand(sp.series(sp.expand(ch + corr), sp.sqrt(n), 0,
                                 2 * ORDER + 1).removeO())
        sines = fourier_sin_coeffs(ch - muvar, muvar, ORDER)
        ch = muvar + sum(c * sp.sin(2 * j * muvar) for j, c in sines.items())
    beta = fourier_sin_coeffs(ch - muvar, muvar, ORDER)
    print("\n# beta (inverse TM): zeta' = zeta - sum beta_j sin(2 j zeta)")
    for j, c in beta.items():
        print(f"BETA[{j}] =", sp.nsimplify(-c))


if __name__ == "__main__":
    main()
