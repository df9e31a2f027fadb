from . import (agrid, lgcache, ngg, quadrature, rng, sapprox, special,
               stirling, sympoly)

__all__ = ["agrid", "lgcache", "ngg", "quadrature", "rng", "sapprox",
           "special", "stirling", "sympoly"]
