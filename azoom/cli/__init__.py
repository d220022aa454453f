"""Command-line product surface (mirrors the reference's entry points):

  python -m azoom.cli.run sim|inf|eval|full --name X   (Final_pipeline/run.py)
  python -m azoom.cli.batch --n 50                     (batch_run.py)
  python -m azoom.cli.analyze                          (analysis.py)
  python -m azoom.cli.train --model deepfpu            (model_training.py)
  python -m azoom.cli.debug_srp DIR                    (scripts/debug_srp.py)
  python -m azoom.cli.dereverb --outdir DIR            (core/dereverb.py)
  python -m azoom.cli.diagnose f.wav                   (core/diagnose.py)
"""
