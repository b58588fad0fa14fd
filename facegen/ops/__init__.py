from facegen.ops import upsample_conv  # noqa: F401
