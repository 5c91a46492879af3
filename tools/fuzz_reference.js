// Differential fuzzer fixture generator — executes the REFERENCE
// (rho-contracts, /root/reference/src/contract.js) on seeded random
// (schema, value, contract) triples and records its exact behavior
// (pass, or the thrown ContractError message bytes) plus each
// contract's toString render. The Scala suite (FuzzParitySpec)
// replays every case through the data-plane compiler and
// byte-compares.
//
// Run (shims per tools/README / memory note):
//   NODE_PATH=/tmp/refrun/node_modules node tools/fuzz_reference.js \
//     > src/test/resources/fuzz_cases.json
//
// Deterministic: mulberry32 PRNG, fixed seed. Cases whose full-value
// inspect render is multi-line are rejected at generation time — the
// engine intentionally renders large values single-line (scale
// guard), a deviation documented in MessageParitySpec.

'use strict'
const c = require('/root/reference/src/contract.js')
const util = require('util')

// ---------- seeded PRNG ----------
function mulberry32(seed) {
  return function () {
    seed |= 0; seed = (seed + 0x6D2B79F5) | 0
    let t = Math.imul(seed ^ (seed >>> 15), 1 | seed)
    t = (t + Math.imul(t ^ (t >>> 7), 61 | t)) ^ t
    return ((t ^ (t >>> 14)) >>> 0) / 4294967296
  }
}
const SEED = parseInt(process.argv[2] || '20260818', 10)
const R = mulberry32(SEED)
const ri = n => Math.floor(R() * n)
const pick = a => a[ri(a.length)]
const chance = p => R() < p

// ---------- type trees (Spark-representable value shapes) ----------
const FIELD_POOL = ['a', 'b', 'cc', 'd_1', 'e', 'f2']
const KEY_POOL = ['k1', 'k2', 'kk', 'z']

function genTree(depth) {
  if (depth <= 0 || chance(0.45)) return { k: pick(['str', 'long', 'dbl', 'bool']) }
  const kind = pick(['arr', 'struct', 'map', 'arr', 'struct'])
  if (kind === 'arr') return { k: 'arr', e: genTree(depth - 1) }
  if (kind === 'map') return { k: 'map', v: genTree(depth - 1) }
  const n = 1 + ri(3)
  const names = FIELD_POOL.slice()
  const fs = []
  for (let i = 0; i < n; i++) fs.push([names.splice(ri(names.length), 1)[0], genTree(depth - 1)])
  return { k: 'struct', fs }
}

function ddl(t) {
  switch (t.k) {
    case 'str': return 'STRING'
    case 'long': return 'INT'
    case 'dbl': return 'DOUBLE'
    case 'bool': return 'BOOLEAN'
    case 'arr': return `ARRAY<${ddl(t.e)}>`
    case 'map': return `MAP<STRING, ${ddl(t.v)}>`
    case 'struct': return `STRUCT<${t.fs.map(([n, s]) => `${n}: ${ddl(s)}`).join(', ')}>`
  }
}

// ---------- values of a tree: JS value + equivalent Spark SQL ----------
const STR_POOL = ['', 'a', 'abc', 'x1', 'hello', 'a b', 'Z', 'en', 'ok']
const LONG_POOL = [-3, -1, 0, 1, 2, 5, 7, 10, 42]
const DBL_POOL = [-2.5, -0.5, 0.25, 1.5, 2.5, 3.75, 5.5, 10.125]

function genValue(t, nullable) {
  if (nullable && chance(0.12)) return { js: null, sql: `CAST(NULL AS ${ddl(t)})` }
  switch (t.k) {
    case 'str': { const s = pick(STR_POOL); return { js: s, sql: `'${s}'` } }
    case 'long': { const n = pick(LONG_POOL); return { js: n, sql: String(n) } }
    case 'dbl': { const d = pick(DBL_POOL); return { js: d, sql: `double(${d})` } }
    case 'bool': { const b = chance(0.5); return { js: b, sql: String(b) } }
    case 'arr': {
      const n = ri(5)
      if (n === 0) return { js: [], sql: `CAST(array() AS ${ddl(t)})` }
      const es = []
      for (let i = 0; i < n; i++) es.push(genValue(t.e, true))
      return { js: es.map(e => e.js), sql: `array(${es.map(e => e.sql).join(', ')})` }
    }
    case 'struct': {
      const js = {}, parts = []
      for (const [n, s] of t.fs) {
        const v = genValue(s, true)
        js[n] = v.js
        parts.push(`'${n}', ${v.sql}`)
      }
      return { js, sql: `named_struct(${parts.join(', ')})` }
    }
    case 'map': {
      const n = ri(4)
      if (n === 0) return { js: {}, sql: `CAST(map() AS ${ddl(t)})` }
      const keys = KEY_POOL.slice(); const js = {}, parts = []
      for (let i = 0; i < Math.min(n, keys.length); i++) {
        const k = keys.splice(ri(keys.length), 1)[0]
        const v = genValue(t.v, true)
        js[k] = v.js
        parts.push(`'${k}', ${v.sql}`)
      }
      return { js, sql: `map(${parts.join(', ')})` }
    }
  }
}

// ---------- contract ASTs, loosely aligned with a tree ----------
const RE_POOL = ['^a', 'b$', '^[a-z]+$', '^x[0-9]+$', 'll', '^[0-9]+$', 'en']

// cross-language pred pool: each entry has identical semantics as a JS
// closure (run by the reference) and as a Catalyst Column expression
// (FuzzParitySpec.predPool). typeof guards make the JS side total —
// null/undefined fail instead of coercing ('' + null) or throwing
// (null.length) — which matches the engine's coalesce(fn, false)
// null-fails rule. Preds are only attached KIND-MATCHED to the value
// tree (never through the cross-type leaf mismatch), so the Spark
// column's static type always agrees with the typeof guard; within a
// kind the pairs agree on the edge values in the pools (NaN: JS
// NaN>5/NaN%2===0/NaN<0 are all false; Spark `<`/`%..=0` on NaN are
// false too — gt5 is long-only because Spark's ORDERING treats NaN as
// the largest double, so dbl NaN>5 would diverge).
const PRED_POOL = {
  gt5: { kinds: ['long'], fn: v => typeof v === 'number' && v > 5 },
  neg: { kinds: ['long', 'dbl'], fn: v => typeof v === 'number' && v < 0 },
  even: { kinds: ['long', 'dbl'], fn: v => typeof v === 'number' && v % 2 === 0 },
  lenGt2: { kinds: ['str'], fn: v => typeof v === 'string' && v.length > 2 },
  startsX: { kinds: ['str'], fn: v => typeof v === 'string' && v.startsWith('x') },
  hasDigit: { kinds: ['str'], fn: v => typeof v === 'string' && /[0-9]/.test(v) },
  isTrue: { kinds: ['bool'], fn: v => v === true },
}
const PREDS_BY_KIND = {}
for (const [p, spec] of Object.entries(PRED_POOL))
  for (const k of spec.kinds) (PREDS_BY_KIND[k] ||= []).push(p)

function leafContract(kind) {
  switch (kind) {
    case 'str': return pick([
      { t: 'string' }, { t: 'string' },
      { t: 'value', v: pick(STR_POOL) },
      { t: 'oneOf', vs: [pick(STR_POOL), pick(STR_POOL)] },
      { t: 'matches', re: pick(RE_POOL) },
      { t: 'any' }, { t: 'truthy' }, { t: 'falsy' }])
    case 'long': return pick([
      { t: 'number' }, { t: 'integer' },
      { t: 'value', v: pick(LONG_POOL) },
      { t: 'oneOf', vs: [pick(LONG_POOL), pick(LONG_POOL), pick(LONG_POOL)] },
      { t: 'any' }, { t: 'truthy' }, { t: 'falsy' }])
    case 'dbl': return pick([
      { t: 'number' }, { t: 'number' }, { t: 'integer' },
      { t: 'value', v: pick(DBL_POOL) }, { t: 'any' }])
    case 'bool': return pick([
      { t: 'bool' }, { t: 'bool' },
      { t: 'value', v: chance(0.5) }, { t: 'truthy' }, { t: 'falsy' },
      { t: 'any' }])
  }
}

function genContract(tree, depth) {
  let base
  switch (tree.k) {
    case 'str': case 'long': case 'dbl': case 'bool': {
      // anonymous pred leaf, always kind-matched (see PRED_POOL note)
      if (chance(0.18)) {
        base = { t: 'pred', p: pick(PREDS_BY_KIND[tree.k]) }
        break
      }
      // wrong-type leaf with prob 0.2 — cross-type failures
      const kind = chance(0.2) ? pick(['str', 'long', 'dbl', 'bool'])
        : tree.k
      base = leafContract(kind)
      // cross-type oneOf member occasionally
      if (base.t === 'oneOf' && chance(0.15)) base.vs.push(pick(LONG_POOL))
      break
    }
    case 'arr': {
      if (chance(0.35)) {
        const n = ri(4) // may mismatch the actual length
        const cs = []
        for (let i = 0; i < n; i++) cs.push(genContract(tree.e, depth - 1))
        base = { t: 'tuple', cs, strict: chance(0.35) }
      } else base = { t: 'array', c: genContract(tree.e, depth - 1) }
      break
    }
    case 'struct': {
      const fields = []
      for (const [n, s] of tree.fs) {
        if (chance(0.85)) {
          let fc = genContract(s, depth - 1)
          if (chance(0.2)) fc = { t: 'optional', c: fc }
          fields.push({ name: n, c: fc })
        }
      }
      if (chance(0.12) || fields.length === 0)
        fields.push({ name: 'ghost', c: leafContract(pick(['str', 'long'])) })
      base = { t: 'object', fields, strict: chance(0.3) }
      break
    }
    case 'map': {
      if (chance(0.3)) {
        // object contract over a dynamic (map-typed) value
        const fields = []
        const keys = KEY_POOL.slice()
        const n = 1 + ri(2)
        for (let i = 0; i < n; i++) {
          let fc = genContract(tree.v, depth - 1)
          if (chance(0.25)) fc = { t: 'optional', c: fc }
          fields.push({ name: keys.splice(ri(keys.length), 1)[0], c: fc })
        }
        base = { t: 'object', fields, strict: chance(0.25) }
      } else base = { t: 'hash', c: genContract(tree.v, depth - 1) }
      break
    }
  }
  // leaf-level refinement / disjunction wrappers
  const isLeafTree = ['str', 'long', 'dbl', 'bool'].includes(tree.k)
  if (chance(0.15)) {
    const other = isLeafTree ? leafContract(pick(['str', 'long', 'bool']))
      : leafContract('str')
    base = chance(0.5) ? { t: 'or', cs: [base, other] }
      : { t: 'or', cs: [other, base] }
  } else if (isLeafTree && chance(0.12)) {
    const gate = chance(0.3) ? { t: 'pred', p: pick(PREDS_BY_KIND[tree.k]) }
      : leafContract(tree.k)
    base = { t: chance(0.3) ? 'silentAnd' : 'and', cs: [gate, base] }
  }
  if (chance(0.06)) base = { t: 'rename', name: 'myc', c: base }
  return base
}

// ---------- AST -> reference contract ----------
function buildRef(a) {
  switch (a.t) {
    case 'string': return c.string
    case 'number': return c.number
    case 'integer': return c.integer
    case 'bool': return c.bool
    case 'any': return c.any
    case 'nothing': return c.nothing
    case 'falsy': return c.falsy
    case 'truthy': return c.truthy
    case 'value': return c.value(a.v)
    case 'oneOf': return c.oneOf.apply(null, a.vs)
    case 'matches': return c.matches(new RegExp(a.re))
    case 'and': return c.and.apply(null, a.cs.map(buildRef))
    case 'silentAnd': return c.silentAnd.apply(null, a.cs.map(buildRef))
    case 'or': return c.or.apply(null, a.cs.map(buildRef))
    case 'optional': return c.optional(buildRef(a.c))
    case 'array': return c.array(buildRef(a.c))
    case 'tuple': {
      const t = c.tuple.apply(null, a.cs.map(buildRef))
      return a.strict ? t.strict() : t
    }
    case 'hash': return c.hash(buildRef(a.c))
    case 'object': {
      const o = {}
      for (const f of a.fields) o[f.name] = buildRef(f.c)
      const oc = c.object(o)
      return a.strict ? oc.strict() : oc
    }
    case 'rename': return buildRef(a.c).rename(a.name)
    case 'pred': return c.pred(PRED_POOL[a.p].fn)
  }
  throw new Error('bad ast ' + JSON.stringify(a))
}

// ---------- main loop ----------
const N = parseInt(process.argv[3] || '500', 10)
const cases = []
let attempts = 0
while (cases.length < N && attempts < N * 40) {
  attempts++
  const tree = genTree(3)
  const value = genValue(tree, chance(0.5))
  // single-line inspect only (engine renders large values single-line
  // by design; that deviation is documented, not under test here)
  if (util.inspect(value.js, false, 5, false).indexOf('\n') >= 0) continue
  const ast = genContract(tree, 3)
  let ref, render
  try {
    ref = buildRef(ast)
    render = ref.toString()
  } catch (e) { continue } // construction-rejected shape; not a case
  // inspection-depth axis: the global setErrorMessageInspectionDepth
  // truncates deep values to [Object]/[Array] in BOTH the full-value
  // section and the "but got" line (utils.js:53-63; default 5). The
  // replay spec groups same-depth cases so the global knob is set once
  // per group (matching the reference's global semantics).
  const depth = chance(0.18) ? 1 + ri(3) : null
  let msg = null
  if (depth !== null) c.setErrorMessageInspectionDepth(depth)
  try { ref.check(value.js, 'data') } catch (e) {
    if (e.name && e.name.indexOf('ContractError') < 0) continue
    msg = e.message
    if (msg.indexOf('\n  ') >= 0 || msg.length > 2000) continue // wrapped render
  } finally {
    if (depth !== null) c.setErrorMessageInspectionDepth(5)
  }
  cases.push({
    id: 'fz' + String(cases.length).padStart(3, '0'),
    tree, sql: value.sql, ast, render, msg, depth
  })
}
if (cases.length < N) {
  process.stderr.write(`WARNING: only ${cases.length} cases after ${attempts} attempts\n`)
}
const passes = cases.filter(x => x.msg === null).length
process.stderr.write(`generated ${cases.length} cases: ${passes} pass, ${cases.length - passes} fail\n`)
process.stdout.write(JSON.stringify(cases, null, 1) + '\n')
