from azoom.eval.bss import bss_eval_sources
from azoom.eval.projection import osinr_osir, sdr_sir, sir_improvement_db
from azoom.eval.stoi import stoi

__all__ = ["bss_eval_sources", "osinr_osir", "sdr_sir", "sir_improvement_db", "stoi"]
