// Differential fuzzer for the FUNCTION-CONTRACT surface — executes the
// REFERENCE (rho-contracts, /root/reference/src/contract.js) on seeded
// random member declarations (positional fn / named fun / method, arity
// windows with trailing optionals, extraArgs, thisArg, returns) plus a
// random call (receiver, argument values, result value), and records
// the member contract's toString render and the call's outcome: pass,
// or the thrown ContractError message bytes (the "(contract was wrapped
// at: …)" JS-stack line stripped). The Scala suite (FuzzFnParitySpec)
// replays each case through ContractRegistry + Publish.wrapAllMulti +
// checkMemberOrThrow and byte-compares.
//
// Run (shims per tools/README / memory note):
//   NODE_PATH=/tmp/refrun/node_modules node tools/fuzz_fn_reference.js \
//     > src/test/resources/fuzz_fn_cases.json
//
// Deterministic: mulberry32 PRNG, fixed seed. Cases where the reference
// throws anything but a ContractError (TypeError territory) or renders
// a value across multiple inspect lines are rejected at generation
// time, mirroring tools/fuzz_reference.js.

'use strict'
const c = require('/root/reference/src/contract.js')

// ---------- seeded PRNG ----------
function mulberry32(seed) {
  return function () {
    seed |= 0; seed = (seed + 0x6D2B79F5) | 0
    let t = Math.imul(seed ^ (seed >>> 15), 1 | seed)
    t = (t + Math.imul(t ^ (t >>> 7), 61 | t)) ^ t
    return ((t ^ (t >>> 14)) >>> 0) / 4294967296
  }
}
const SEED = parseInt(process.argv[2] || '40260818', 10)
const R = mulberry32(SEED)
const ri = n => Math.floor(R() * n)
const pick = a => a[ri(a.length)]
const chance = p => R() < p

const STR_POOL = ['', 'a', 'abc', 'x1', 'hello', 'en', 'ok']
const LONG_POOL = [-3, -1, 0, 1, 2, 5, 7, 42]
const DBL_POOL = [-2.5, -0.5, 0.25, 1.5, 3.75, 10.125]
const RE_POOL = ['^a', 'b$', '^[a-z]+$', '^x[0-9]+$', 'en']
const FIELD_POOL = ['a', 'b', 'cc', 'd_1', 'e', 'f2']

// ---------- leaf contract ASTs, each with a "natural" value type ----------
function leafContract() {
  return pick([
    { t: 'string', ty: 'str' },
    { t: 'number', ty: 'dbl' },
    { t: 'integer', ty: 'long' },
    { t: 'bool', ty: 'bool' },
    { t: 'value', ty: 'str', v: pick(STR_POOL) },
    { t: 'value', ty: 'long', v: pick(LONG_POOL) },
    { t: 'oneOf', ty: 'str', vs: [pick(STR_POOL), pick(STR_POOL)] },
    { t: 'oneOf', ty: 'long', vs: [pick(LONG_POOL), pick(LONG_POOL)] },
    { t: 'matches', ty: 'str', re: pick(RE_POOL) },
    { t: 'any', ty: pick(['str', 'long', 'bool']) },
    { t: 'truthy', ty: pick(['str', 'long', 'bool']) },
    { t: 'falsy', ty: pick(['str', 'long', 'bool']) },
  ])
}

// an OBJECT contract AST: 1-2 fields, leaf / nested object / array-of-leaf.
// Top-level member-input objects are never strict (the data-plane frame
// carries an undeclared `id` column by design); nested ones may be.
function objContract(depth, allowStrict) {
  const n = 1 + ri(2)
  const names = FIELD_POOL.slice()
  const fields = []
  for (let i = 0; i < n; i++) {
    const name = names.splice(ri(names.length), 1)[0]
    let fc
    const r = R()
    if (depth > 0 && r < 0.22) fc = objContract(depth - 1, true)
    else if (depth > 0 && r < 0.34) fc = { t: 'array', c: leafContract() }
    else fc = leafContract()
    if (chance(0.15)) fc = { t: 'optional', c: fc }
    fields.push({ name, c: fc })
  }
  return { t: 'object', fields, strict: allowStrict && chance(0.25) }
}

function buildRef(a) {
  switch (a.t) {
    case 'string': return c.string
    case 'number': return c.number
    case 'integer': return c.integer
    case 'bool': return c.bool
    case 'any': return c.any
    case 'truthy': return c.truthy
    case 'falsy': return c.falsy
    case 'value': return c.value(a.v)
    case 'oneOf': return c.oneOf(...a.vs)
    case 'matches': return c.matches(new RegExp(a.re))
    case 'optional': return c.optional(buildRef(a.c))
    case 'array': return c.array(buildRef(a.c))
    case 'object': {
      const fs = {}
      for (const f of a.fields) fs[f.name] = buildRef(f.c)
      const o = c.object(fs)
      return a.strict ? o.strict() : o
    }
    default: throw new Error('bad ast ' + a.t)
  }
}

// ---------- values tracking a contract (mostly conforming, planted noise) --
const sq = s => `'${s}'`

function leafValue(a, noisy, forcedTy) {
  // a forced type that differs from the contract's natural type counts
  // as "wrong": value/oneOf literals must not leak their own type into
  // a homogeneous array of another type
  const wrong = forcedTy ? forcedTy !== a.ty : noisy && chance(0.18)
  const ty = forcedTy || (wrong ? pick(['str', 'long', 'dbl', 'bool']) : a.ty)
  if (noisy && chance(0.1)) {
    const ddl = { str: 'STRING', long: 'INT', dbl: 'DOUBLE', bool: 'BOOLEAN' }[ty]
    return { js: null, sql: `CAST(NULL AS ${ddl})` }
  }
  switch (ty) {
    case 'str': {
      const s = !wrong && a.t === 'value' ? a.v
        : !wrong && a.t === 'oneOf' && chance(0.7) ? pick(a.vs)
        : pick(STR_POOL)
      return typeof s === 'string' ? { js: s, sql: sq(s) }
        : { js: s, sql: String(s) }
    }
    case 'long': {
      const v = !wrong && a.t === 'value' ? a.v
        : !wrong && a.t === 'oneOf' && chance(0.7) ? pick(a.vs)
        : pick(LONG_POOL)
      return typeof v === 'number' ? { js: v, sql: String(v) }
        : { js: v, sql: sq(v) }
    }
    case 'dbl': { const d = pick(DBL_POOL); return { js: d, sql: `double(${d})` } }
    case 'bool': { const b = chance(0.5); return { js: b, sql: String(b) } }
  }
}

function valueFor(a, noisy) {
  switch (a.t) {
    case 'optional': return valueFor(a.c, noisy)
    case 'array': {
      const n = ri(4)
      if (n === 0) {
        const ddl = { str: 'STRING', long: 'INT', dbl: 'DOUBLE', bool: 'BOOLEAN' }[a.c.ty] || 'STRING'
        return { js: [], sql: `CAST(array() AS ARRAY<${ddl}>)` }
      }
      // Spark arrays are homogeneous: pick ONE element type for the
      // whole array (possibly the wrong one), never mixed types
      const ty = noisy && chance(0.18)
        ? pick(['str', 'long', 'dbl', 'bool']) : a.c.ty
      const es = []
      for (let i = 0; i < n; i++) es.push(leafValue(a.c, noisy && chance(0.4), ty))
      return { js: es.map(e => e.js), sql: `array(${es.map(e => e.sql).join(', ')})` }
    }
    case 'object': {
      const js = {}, parts = []
      for (const f of a.fields) {
        if (noisy && chance(0.1)) { // "missing" required field = null value
          js[f.name] = null
          parts.push(`'${f.name}', CAST(NULL AS STRING)`)
        } else {
          const v = valueFor(f.c, noisy)
          js[f.name] = v.js
          parts.push(`'${f.name}', ${v.sql}`)
        }
      }
      if (noisy && chance(0.12)) { // undeclared extra field
        js.zz = pick(LONG_POOL)
        parts.push(`'zz', ${js.zz}`)
      }
      return { js, sql: `named_struct(${parts.join(', ')})` }
    }
    default: return leafValue(a, noisy)
  }
}

// a TOP-LEVEL frame value: the object's fields as SQL columns, with
// the data-plane's id column appended LAST on both sides so
// full-object renders byte-match.
function frameValue(objAst, noisy, idNo) {
  const js = {}, cols = []
  for (const f of objAst.fields) {
    if (noisy && chance(0.1)) {
      js[f.name] = null
      cols.push(`CAST(NULL AS STRING) as ${f.name}`)
    } else {
      const v = valueFor(f.c, noisy)
      js[f.name] = v.js
      cols.push(`${v.sql} as ${f.name}`)
    }
  }
  if (noisy && chance(0.12)) {
    js.zz = pick(LONG_POOL)
    cols.push(`${js.zz} as zz`)
  }
  js.id = idNo
  cols.push(`${idNo} as id`)
  return { js, sql: cols.join(', ') }
}

// ---------- member declaration + call ----------
function genCase(no) {
  const kind = pick(['fn', 'fn', 'fn', 'fun', 'fun', 'method'])
  const nIn = 1 + ri(3)
  const names = ['docs', 'media', 'refs'].slice(0, nIn)
  const inputs = []
  for (let i = 0; i < nIn; i++) {
    inputs.push({
      name: names[i],
      c: objContract(1, false),
      optional: false,
    })
  }
  // trailing optionals (formals guard requires optionals last)
  if (chance(0.3)) {
    let k = 1 + ri(nIn)
    for (let i = nIn - k; i < nIn; i++) inputs[i].optional = true
  }
  // extraArgs composes with every member kind in the reference
  const extras = chance(0.25) ? objContract(0, false) : null
  const ths = kind === 'method' ? objContract(0, false)
    : (chance(0.2) ? objContract(0, false) : null)
  const rets = chance(0.4) ? objContract(1, false) : null

  const nReq = inputs.filter(i => !i.optional).length
  // call shape: mostly within the window, sometimes off by one
  let m
  const roll = R()
  if (roll < 0.65) m = nReq + ri(nIn - nReq + 1)
  else if (roll < 0.8) m = Math.max(0, nReq - 1)
  else m = nIn + 1 + ri(2)
  const noisy = chance(0.7)
  const args = []
  for (let i = 0; i < m; i++) {
    const shape = i < nIn ? inputs[i].c : (extras || objContract(0, false))
    args.push(frameValue(shape, noisy && chance(0.6), no * 10 + i))
  }
  const thisVal = ths ? frameValue(ths, noisy && chance(0.5), no * 10 + 8) : null
  const resultVal = frameValue(rets || objContract(0, false),
    noisy && chance(0.5), no * 10 + 9)

  return { kind, inputs, extras, ths, rets, args, thisVal, resultVal }
}

function refContract(spec) {
  const argC = a => {
    const base = buildRef(a.c)
    return a.optional ? c.optional(base) : base
  }
  let fc
  if (spec.kind === 'fn') {
    fc = c.fn(...spec.inputs.map(argC))
  } else if (spec.kind === 'fun') {
    fc = c.fun(...spec.inputs.map(a => ({ [a.name]: argC(a) })))
  } else {
    fc = c.method(buildRef(spec.ths),
      ...spec.inputs.map(a => ({ [a.name]: argC(a) })))
  }
  if (spec.extras) fc = fc.extraArgs(c.array(buildRef(spec.extras)))
  if (spec.ths && spec.kind !== 'method') fc = fc.thisArg(buildRef(spec.ths))
  if (spec.rets) fc = fc.returns(buildRef(spec.rets))
  return fc
}

function runRef(spec) {
  const fc = refContract(spec)
  const render = fc.toString()
  const wrapped = fc.wrap(function () { return spec.resultVal.js }, 'member')
  try {
    wrapped.apply(spec.thisVal ? spec.thisVal.js : undefined,
      spec.args.map(a => a.js))
    return { render, msg: null }
  } catch (e) {
    if (e.name !== 'ContractError') return { render, skip: e.name + ': ' + e.message }
    const msg = e.message
      .replace(/\(contract was wrapped at: [^)]*\)\n/g, '')
    if (/\n\s{2,}\S/.test(msg.split('\n').slice(1).join('\n')) &&
        /[{[]\n/.test(msg)) return { render, skip: 'multiline-inspect' }
    return { render, msg }
  }
}

// ---------- main ----------
const N = parseInt(process.argv[3] || '300', 10)
const out = []
let no = 0, attempts = 0
while (out.length < N && attempts < N * 20) {
  attempts++
  const spec = genCase(no)
  let r
  try { r = runRef(spec) } catch (e) { continue }
  if (r.skip !== undefined) continue
  out.push({
    id: 'ff' + String(no).padStart(3, '0'),
    kind: spec.kind,
    inputs: spec.inputs.map(a => ({ name: a.name, optional: a.optional, c: a.c })),
    extras: spec.extras,
    ths: spec.ths,
    rets: spec.rets,
    call: {
      args: spec.args.map(a => a.sql),
      thisArg: spec.thisVal ? spec.thisVal.sql : null,
      result: spec.resultVal.sql,
    },
    render: r.render,
    msg: r.msg,
  })
  no++
}
const fails = out.filter(x => x.msg !== null).length
process.stderr.write(`${out.length} cases (${fails} fail, ${attempts} attempts)\n`)
process.stdout.write(JSON.stringify(out, null, 1) + '\n')
