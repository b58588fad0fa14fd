from facegen.data import augment, lfw, pipeline, synthetic  # noqa: F401
