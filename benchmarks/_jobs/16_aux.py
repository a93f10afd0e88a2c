import os, runpy
os.chdir("/root/repo")
import sys
sys.argv = ["aux_pipelines.py"]
runpy.run_path("/root/repo/benchmarks/aux_pipelines.py", run_name="__main__")
