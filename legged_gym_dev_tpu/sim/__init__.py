from .rom_sim import RomSim, RomSimState

__all__ = ["RomSim", "RomSimState"]
