#!/usr/bin/env python
"""Main GAN trainer CLI — `python train.py [flags]` is the rebuild of
`th train.lua [flags]` (train.lua:16-50; flag list README.md:130-164).
All reference flags are accepted; see `python train.py --help`."""

from facegen.train.loop import main

if __name__ == "__main__":
    main()
