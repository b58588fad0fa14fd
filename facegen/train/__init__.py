from facegen.train import losses, metrics, optim, step  # noqa: F401
