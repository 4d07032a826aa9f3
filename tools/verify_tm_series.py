"""Verify the Krüger TM alpha/beta coefficients (Karney 2011, eqs. 35-36)
against the exact defining relations, in 50-digit arithmetic.

alpha_j are the Fourier coefficients of the rectifying latitude mu as a
function of the conformal latitude chi:  mu = chi + sum alpha_j sin(2 j chi);
beta_j give the reverse.  chi(phi) has a closed form; mu(phi) is the
normalized meridian arc, computed here by mpmath quadrature.  If the
residual is O(n^7) (~1e-19 for WGS84) across latitudes, the tables are
correct.

Run: python tools/verify_tm_series.py
"""

import mpmath as mp

mp.mp.dps = 50

# third flattening for WGS84
f = mp.mpf(1) / mp.mpf("298.257223563")
n = f / (2 - f)
e = mp.sqrt(f * (2 - f))

ALPHA = [
    (mp.mpf(1) / 2, -mp.mpf(2) / 3, mp.mpf(5) / 16, mp.mpf(41) / 180,
     -mp.mpf(127) / 288, mp.mpf(7891) / 37800),
    (0, mp.mpf(13) / 48, -mp.mpf(3) / 5, mp.mpf(557) / 1440,
     mp.mpf(281) / 630, -mp.mpf(1983433) / 1935360),
    (0, 0, mp.mpf(61) / 240, -mp.mpf(103) / 140, mp.mpf(15061) / 26880,
     mp.mpf(167603) / 181440),
    (0, 0, 0, mp.mpf(49561) / 161280, -mp.mpf(179) / 168,
     mp.mpf(6601661) / 7257600),
    (0, 0, 0, 0, mp.mpf(34729) / 80640, -mp.mpf(3418889) / 1995840),
    (0, 0, 0, 0, 0, mp.mpf(212378941) / 319334400),
]
BETA = [
    (mp.mpf(1) / 2, -mp.mpf(2) / 3, mp.mpf(37) / 96, -mp.mpf(1) / 360,
     -mp.mpf(81) / 512, mp.mpf(96199) / 604800),
    (0, mp.mpf(1) / 48, mp.mpf(1) / 15, -mp.mpf(437) / 1440,
     mp.mpf(46) / 105, -mp.mpf(1118711) / 3870720),
    (0, 0, mp.mpf(17) / 480, -mp.mpf(37) / 840, -mp.mpf(209) / 4480,
     mp.mpf(5569) / 90720),
    (0, 0, 0, mp.mpf(4397) / 161280, -mp.mpf(11) / 504,
     -mp.mpf(830251) / 7257600),
    (0, 0, 0, 0, mp.mpf(4583) / 161280, -mp.mpf(108847) / 3991680),
    (0, 0, 0, 0, 0, mp.mpf(20648693) / 638668800),
]


def poly(coeffs, x):
    return sum(c * x ** (k + 1) for k, c in enumerate(coeffs))


def chi_of_phi(phi):
    s = mp.sin(phi)
    psi = mp.asinh(mp.tan(phi)) - e * mp.atanh(e * s)
    return mp.atan(mp.sinh(psi))


def mu_of_phi(phi):
    integrand = lambda p: (1 - e * e) / (1 - (e * mp.sin(p)) ** 2) ** mp.mpf(1.5)
    m = mp.quad(integrand, [0, phi])
    mq = mp.quad(integrand, [0, mp.pi / 2])
    return m / mq * mp.pi / 2


def main():
    worst_a = worst_b = mp.mpf(0)
    for deg in range(5, 90, 7):
        phi = mp.mpf(deg) * mp.pi / 180
        chi = chi_of_phi(phi)
        mu = mu_of_phi(phi)
        mu_series = chi + sum(poly(ALPHA[j - 1], n) * mp.sin(2 * j * chi)
                              for j in range(1, 7))
        chi_series = mu - sum(poly(BETA[j - 1], n) * mp.sin(2 * j * mu)
                              for j in range(1, 7))
        worst_a = max(worst_a, abs(mu_series - mu))
        worst_b = max(worst_b, abs(chi_series - chi))
    print("worst |alpha residual|:", mp.nstr(worst_a, 3),
          " (n^7 =", mp.nstr(n ** 7, 3), ")")
    print("worst |beta residual| :", mp.nstr(worst_b, 3))
    assert worst_a < 10 * n ** 7 and worst_b < 10 * n ** 7, "tables wrong!"
    print("alpha/beta tables VERIFIED at order 6")
    # rectifying radius A
    A_over = (1 + n ** 2 / 4 + n ** 4 / 64 + n ** 6 / 256) / (1 + n)
    integrand = lambda p: (1 - e * e) / (1 - (e * mp.sin(p)) ** 2) ** mp.mpf(1.5)
    mq = mp.quad(integrand, [0, mp.pi / 2])
    print("A residual:", mp.nstr(abs(mq / (mp.pi / 2) - A_over), 3))
    assert abs(mq / (mp.pi / 2) - A_over) < 10 * n ** 8
    print("A VERIFIED")


if __name__ == "__main__":
    main()
