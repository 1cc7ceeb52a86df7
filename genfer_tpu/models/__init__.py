"""Model-family pipelines compiled to single XLA programs.

Where ``genfer_tpu.compile`` traces the generic GF DAG (one XLA op per
DAG node), these modules exploit model structure to collapse repeated
observation blocks into ``lax.scan`` bodies — the graph size becomes
independent of the number of observations, which is what makes
single-dispatch TPU inference viable (a traced population model is
~32k XLA ops; the scanned form is ~40 plus one scan body).
"""

from .hmm import CompiledHMM, CompiledMixture
from .population import CompiledPopulation, CompiledTwoPopulations

__all__ = ["CompiledHMM", "CompiledMixture", "CompiledPopulation",
           "CompiledTwoPopulations"]
