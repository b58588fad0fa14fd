from facegen.utils import checkpoint, grids, infer, viz  # noqa: F401
