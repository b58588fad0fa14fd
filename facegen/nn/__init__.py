from facegen.nn.core import (  # noqa: F401
    Ctx,
    Module,
    branches,
    elementwise,
    param_count,
    sequential,
    stateless,
)
from facegen.nn import init, layers  # noqa: F401
