from .schedules import NoiseSchedule
from .samplers import UniPCCoeffs, DDIMCoeffs, make_sampler_coeffs
