"""Public enums (reference ``pyproj/enums.py``)."""

from enum import Enum, IntFlag


class TransformDirection(str, Enum):
    """reference pyproj/enums.py:75-87"""
    FORWARD = "FORWARD"
    INVERSE = "INVERSE"
    IDENT = "IDENT"


class WktVersion(str, Enum):
    WKT2_2019 = "WKT2_2019"
    WKT2_2019_SIMPLIFIED = "WKT2_2019_SIMPLIFIED"
    WKT1_GDAL = "WKT1_GDAL"


class ProjVersion(IntFlag):
    PROJ_4 = 4
    PROJ_5 = 5


class PJType(str, Enum):
    """reference pyproj/enums.py:90-153 (subset the engine can produce)"""
    GEOGRAPHIC_2D_CRS = "GEOGRAPHIC_2D_CRS"
    GEOGRAPHIC_3D_CRS = "GEOGRAPHIC_3D_CRS"
    GEOCENTRIC_CRS = "GEOCENTRIC_CRS"
    PROJECTED_CRS = "PROJECTED_CRS"


class GeodIntermediateFlag(IntFlag):
    """reference pyproj/enums.py:156-174"""
    DEFAULT = 0x0
    NPTS_MASK = 0xF
    NPTS_ROUND = 0x0
    NPTS_CEIL = 0x1
    NPTS_TRUNC = 0x2
    DEL_S_MASK = 0xF0
    DEL_S_RECALC = 0x00
    DEL_S_NO_RECALC = 0x10
    AZIS_MASK = 0xF00
    AZIS_DISCARD = 0x000
    AZIS_KEEP = 0x100
