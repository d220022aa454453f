from azoom.eval.projection import osinr_osir, sdr_sir, sir_improvement_db

__all__ = ["osinr_osir", "sdr_sir", "sir_improvement_db"]
