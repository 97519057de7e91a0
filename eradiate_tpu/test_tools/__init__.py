from . import regression  # noqa: F401
from .regression import (  # noqa: F401
    Chi2Test,
    IndependentStudentTTest,
    PairedStudentTTest,
    RegressionTest,
    RMSETest,
    SidakTTest,
    ZTest,
)
