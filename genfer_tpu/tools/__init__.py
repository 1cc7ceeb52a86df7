"""Auxiliary command-line tools (reference: src/bin/*.rs).

* ``stats``      - parse + support-analyze a program, print summary
* ``translate``  - compile SGCL to WebPPL or Anglican source
* ``generators`` - emit the benchmark model families (hmm, mixture,
  switchpoint, population, two_populations, digitRecognition baselines)
"""
