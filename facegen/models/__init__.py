from facegen.models import gan  # noqa: F401
