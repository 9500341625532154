"""Regenerate the debug fixtures in the current 11-field format.

The reference ships a stale 8-field ``debug_programs.json`` that its own
``__getitem__`` cannot read (SURVEY.md §4; gqa_dataset_entry.py:479-491 reads
11 fields). This tool builds fresh raw GQA-format questions over the four
debug scenes and runs the real preprocessor, so the fixture exercises the
exact production path.

Run: python tools/make_debug_fixtures.py
"""
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from graphvqa_tpu.data.preprocess import preprocess_questions

ASSET_DIR = pathlib.Path(__file__).resolve().parent.parent / "graphvqa_tpu" / "assets" / "debug"
REFERENCE_SCENES = pathlib.Path("/root/reference/debug_sceneGraphs.json")

# Raw questions in genuine GQA format over the debug scenes
# (object ids match debug_sceneGraphs.json).
RAW_QUESTIONS = {
    "07333408": {
        "imageId": "2375429",
        "question": "What is on the white wall?",
        "answer": "pipe",
        "fullAnswer": "The pipe is on the wall.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "wall (722332)"},
            {"operation": "filter color", "dependencies": [0], "argument": "white"},
            {"operation": "relate", "dependencies": [1], "argument": "_,on,s (722335)"},
            {"operation": "query", "dependencies": [2], "argument": "name"},
        ],
        "annotations": {"answer": {"0": "722335"}, "question": {"4:6": "722332"},
                        "fullAnswer": {"1": "722335", "5": "722332"}},
        "types": {"detailed": "relS", "semantic": "rel", "structural": "query"},
        "groups": {"global": "", "local": "14-wall_on,s"},
        "entailed": [], "equivalent": ["07333408"], "isBalanced": True,
    },
    "07333409": {
        "imageId": "2375429",
        "question": "Is the wall white?",
        "answer": "yes",
        "fullAnswer": "Yes, the wall is white.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "wall (722332)"},
            {"operation": "verify color", "dependencies": [0], "argument": "white"},
        ],
        "annotations": {"answer": {}, "question": {"2": "722332"},
                        "fullAnswer": {"3": "722332"}},
        "types": {"detailed": "verifyAttr", "semantic": "attr", "structural": "verify"},
        "groups": {"global": None, "local": "13-wall_white"},
        "entailed": [], "equivalent": ["07333409"], "isBalanced": True,
    },
    "07333410": {
        "imageId": "2354786",
        "question": "Is there a car in the picture?",
        "answer": "yes",
        "fullAnswer": "Yes, there is a car.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "car (2260042)"},
            {"operation": "exist", "dependencies": [0], "argument": "?"},
        ],
        "annotations": {"answer": {}, "question": {"3": "2260042"}, "fullAnswer": {"4": "2260042"}},
        "types": {"detailed": "existThis", "semantic": "obj", "structural": "verify"},
        "groups": {"global": None, "local": "04-car"},
        "entailed": [], "equivalent": ["07333410"], "isBalanced": True,
    },
    "07333411": {
        "imageId": "2336498",
        "question": "What color is the dog on top of the floor?",
        "answer": "brown",
        "fullAnswer": "The dog is brown.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "floor (968663)"},
            {"operation": "relate", "dependencies": [0], "argument": "dog,on top of,s (968662)"},
            {"operation": "query", "dependencies": [1], "argument": "color"},
        ],
        "annotations": {"answer": {}, "question": {"4": "968662"}, "fullAnswer": {"1": "968662"}},
        "types": {"detailed": "relS", "semantic": "attr", "structural": "query"},
        "groups": {"global": "color", "local": "06-dog_color"},
        "entailed": [], "equivalent": ["07333411"], "isBalanced": True,
    },
    "07333412": {
        "imageId": "2315892",
        "question": "Is the apple green or red?",
        "answer": "green",
        "fullAnswer": "The apple is green.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "apple (3623881)"},
            {"operation": "choose color", "dependencies": [0], "argument": "green|red"},
        ],
        "annotations": {"answer": {}, "question": {"2": "3623881"}, "fullAnswer": {"1": "3623881"}},
        "types": {"detailed": "chooseAttr", "semantic": "attr", "structural": "choose"},
        "groups": {"global": "color", "local": "07-apple_color"},
        "entailed": [], "equivalent": ["07333412"], "isBalanced": True,
    },
    "07333413": {
        "imageId": "2315892",
        "question": "Are there both a bowl and a table in this photo?",
        "answer": "yes",
        "fullAnswer": "Yes, there is a bowl and a table.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "bowl (3328073)"},
            {"operation": "exist", "dependencies": [0], "argument": "?"},
            {"operation": "select", "dependencies": [], "argument": "table (3327102)"},
            {"operation": "exist", "dependencies": [2], "argument": "?"},
            {"operation": "and", "dependencies": [1, 3], "argument": ""},
        ],
        "annotations": {"answer": {}, "question": {"4": "3328073", "8": "3327102"},
                        "fullAnswer": {}},
        "types": {"detailed": "existAndC", "semantic": "obj", "structural": "logical"},
        "groups": {"global": None, "local": "09-bowl_table"},
        "entailed": [], "equivalent": ["07333413"], "isBalanced": True,
    },
    "07333414": {
        "imageId": "2336498",
        "question": "Is the bowl to the left of the table made of wood?",
        "answer": "yes",
        "fullAnswer": "Yes, the bowl is wooden.",
        "semantic": [
            {"operation": "select", "dependencies": [], "argument": "table (968671)"},
            {"operation": "relate", "dependencies": [0], "argument": "bowl,to the left of,o (968670)"},
            {"operation": "verify material", "dependencies": [1], "argument": "wood"},
        ],
        "annotations": {"answer": {}, "question": {"2": "968670", "8": "968671"},
                        "fullAnswer": {"2": "968670"}},
        "types": {"detailed": "verifyAttr", "semantic": "attr", "structural": "verify"},
        "groups": {"global": None, "local": "11-bowl_wood"},
        "entailed": [], "equivalent": ["07333414"], "isBalanced": True,
    },
}


def main():
    ASSET_DIR.mkdir(parents=True, exist_ok=True)
    sg_data = json.loads(REFERENCE_SCENES.read_text())
    (ASSET_DIR / "debug_sceneGraphs.json").write_text(json.dumps(sg_data, indent=1))
    (ASSET_DIR / "debug_questions.json").write_text(json.dumps(RAW_QUESTIONS, indent=1))
    programs = preprocess_questions(RAW_QUESTIONS, sg_data, seed=0)
    (ASSET_DIR / "debug_programs.json").write_text(json.dumps(programs, indent=1))
    print(f"wrote {len(programs)} fixtures -> {ASSET_DIR}")
    for p in programs:
        print(" ", p[3], p[1], "->", p[9])


if __name__ == "__main__":
    main()
