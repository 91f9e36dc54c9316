* timtab1-class MIP deck (hand-authored fixture): a tiny timetabling-style
* mixed-integer program with MARKER INTORG/INTEND blocks, UI/BV bound types,
* and mixed row senses. The reference's whole MPS workflow targets exactly
* this deck class (problems/timtab1.mps, glpk_interface.cpp:102) and its
* oracle solves the LP RELAXATION (glp_simplex, solver_glpk.cpp:23) — the
* semantics read_mps reproduces: integer markers are accepted, recorded on
* MPSProblem.integer, and relaxed to continuous with a logged warning.
NAME          TIMETAB_MIP
ROWS
 N  COST
 E  DEMAND
 L  CAP1
 G  MINSRV
 L  BUDGET
COLUMNS
    X1        COST           1.5    DEMAND          1.
    X1        CAP1            2.
    X2        COST            2.    DEMAND          1.
    X2        MINSRV          1.
    MARKER                 'MARKER'                 'INTORG'
    Y1        COST            .5    DEMAND          1.
    Y1        BUDGET          1.
    Y2        COST            .8    CAP1            1.
    Y2        BUDGET          1.
    Y3        COST            .9    MINSRV          2.
    Y3        BUDGET          1.
    MARKER                 'MARKER'                 'INTEND'
    Z1        COST           -4.    CAP1            3.
RHS
    RHS       DEMAND         10.    CAP1           15.
    RHS       MINSRV          3.    BUDGET         12.
BOUNDS
 UI BND       Y1              8.
 UP BND       Y2              6.
 LI BND       Y3              1.
 BV BND       Z1
ENDATA
