from .datasets import CylinderFlow, TravelingWave, TravelingWaveHighFreq

__all__ = ["TravelingWave", "TravelingWaveHighFreq", "CylinderFlow"]
