"""NEF-on-JAX engine: declarative graph -> jitted lax.scan simulation."""

from ..ops.neurons import (LIF, LIFRate, LoihiLIF, QuantizedLIF,
                           RectifiedLinear, SpikingRectifiedLinear,
                           SurrogateLIF)
from ..ops.synapses import Alpha, Lowpass
from .distributions import (Choice, CosineSimilarity, Distribution,
                            Exponential, Rd, ScatteredHypersphere, Sobol,
                            SSPMixedEval, SSPSobol, Uniform,
                            UniformHypersphere)
from .graph import (BatchedConnection, Connection, Default, Ensemble,
                    EnsembleArray, LearningRule, Network, Neurons, Node,
                    ObjView, PES, Probe, Voja)
from .export import ServingModel, save_bundle
from .processes import TimeTable, WhiteSignal, clamp_table, white_signal
from .realtime import ClosedLoopSession
from .simulator import Simulator

__all__ = [
    "LIF", "LIFRate", "LoihiLIF", "QuantizedLIF", "RectifiedLinear",
    "SpikingRectifiedLinear", "SurrogateLIF",
    "Alpha", "Lowpass",
    "Choice", "CosineSimilarity", "Distribution", "Exponential",
    "Rd", "ScatteredHypersphere", "Sobol", "SSPMixedEval", "SSPSobol",
    "Uniform", "UniformHypersphere",
    "BatchedConnection", "Connection", "Default", "Ensemble", "EnsembleArray",
    "LearningRule", "Network", "Neurons", "Node", "ObjView", "PES", "Probe",
    "Voja", "TimeTable", "WhiteSignal", "clamp_table", "white_signal",
    "ClosedLoopSession", "ServingModel", "Simulator", "save_bundle",
]
