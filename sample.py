#!/usr/bin/env python
"""Sampler CLI — `python sample.py [flags]` rebuilds `th sample.lua`
(sample.lua:9-24): grids of 1024 generations, best/worst-64 by D score,
optional nearest-neighbour search over the training set."""

from facegen.sample import main

if __name__ == "__main__":
    main()
