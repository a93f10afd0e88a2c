import os, runpy, sys
os.chdir("/root/repo")
sys.argv = ["aux_pipelines.py"]
runpy.run_path("/root/repo/benchmarks/aux_pipelines.py", run_name="__main__")
